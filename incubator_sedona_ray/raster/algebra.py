"""Raster map algebra (the RS_ band-math family,
``common/.../raster/MapAlgebra.java`` / ``RasterBandAccessors``):
band-wise arithmetic, normalized difference, statistics. Bands are
numpy arrays inside :class:`..raster.Raster`; the batch variants operate on
``list<double>`` band columns (the legacy GeoTiff DataFrame model,
``GeotiffSchema.scala:44-49``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .raster import Raster


def rs_add(r: Raster, band_a: int, band_b: int) -> np.ndarray:
    return r.data[band_a - 1] + r.data[band_b - 1]


def rs_subtract(r: Raster, band_a: int, band_b: int) -> np.ndarray:
    return r.data[band_a - 1] - r.data[band_b - 1]


def rs_multiply(r: Raster, band_a: int, band_b: int) -> np.ndarray:
    return r.data[band_a - 1] * r.data[band_b - 1]


def rs_divide(r: Raster, band_a: int, band_b: int) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(r.data[band_b - 1] != 0, r.data[band_a - 1] / r.data[band_b - 1], np.nan)


def rs_normalized_difference(r: Raster, band_a: int, band_b: int) -> np.ndarray:
    """(a - b) / (a + b), NaN where the sum is 0 (NDVI-style)."""
    a, b = r.data[band_a - 1], r.data[band_b - 1]
    s = a + b
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(s != 0, (a - b) / s, np.nan)


def rs_band_stats(r: Raster, band: int = 1) -> dict:
    """count / sum / mean / stddev / min / max of one band (RS_SummaryStats)."""
    d = r.data[band - 1]
    ok = d[~np.isnan(d)]
    return {
        "count": int(ok.size),
        "sum": float(ok.sum()),
        "mean": float(ok.mean()) if ok.size else float("nan"),
        "stddev": float(ok.std()) if ok.size else float("nan"),
        "min": float(ok.min()) if ok.size else float("nan"),
        "max": float(ok.max()) if ok.size else float("nan"),
    }


def rs_count_value(r: Raster, band: int, value: float) -> int:
    """RS_Count: occurrences of a value in a band."""
    return int((r.data[band - 1] == value).sum())


# -- batch variants over list<double> band columns (legacy GeoTiff rows) ----

def band_op_fn(op: str, col_a: str, col_b: str, out_col: str):
    """map_batches stage applying a band-wise op to two list<double> columns
    row by row (each row = one image band)."""
    ops = {
        "add": np.add,
        "subtract": np.subtract,
        "multiply": np.multiply,
    }

    def norm_diff(a, b):
        s = a + b
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(s != 0, (a - b) / s, np.nan)

    fn = ops.get(op, norm_diff if op == "normalized_difference" else None)
    if fn is None:
        raise ValueError(op)

    def stage(batch: pa.Table) -> pa.Table:
        out = []
        for a, b in zip(batch[col_a].to_pylist(), batch[col_b].to_pylist()):
            out.append(fn(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)))
        return batch.append_column(out_col, pa.array(out, type=pa.list_(pa.float64())))

    return stage


# ---------------------------------------------------------------------------
# array-based band surface (the legacy RS_ SQL catalog: MapAlgebra.scala /
# IO.scala operate on flattened list<double> band columns; per-element
# formulas mirrored exactly, incl. the 2-decimal Scala rounding and
# int-truncation quirks)
# ---------------------------------------------------------------------------

def _scala_round2(x: np.ndarray) -> np.ndarray:
    """Scala's `(v*100).round/100.0`: Long.round = floor(x + 0.5)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5) / 100.0


def band_add(b1, b2):
    return np.asarray(b1, np.float64) + np.asarray(b2, np.float64)


def band_subtract(b1, b2):
    """NOTE reference order: result = band2 - band1 (MapAlgebra.scala:441)."""
    return np.asarray(b2, np.float64) - np.asarray(b1, np.float64)


def band_multiply(b1, b2):
    return np.asarray(b1, np.float64) * np.asarray(b2, np.float64)


def band_divide(b1, b2):
    return _scala_round2(np.asarray(b1, np.float64) / np.asarray(b2, np.float64))


def band_multiply_factor(b, factor: float):
    return np.asarray(b, np.float64) * factor


def band_modulo(b, dividend: float):
    return np.asarray(b, np.float64) % dividend


def band_square_root(b):
    return _scala_round2(np.sqrt(np.asarray(b, np.float64)))


def band_bitwise_and(b1, b2):
    return (np.asarray(b1, np.float64).astype(np.int64) & np.asarray(b2, np.float64).astype(np.int64)).astype(np.float64)


def band_bitwise_or(b1, b2):
    return (np.asarray(b1, np.float64).astype(np.int64) | np.asarray(b2, np.float64).astype(np.int64)).astype(np.float64)


def band_greater_than(b, target: float):
    return (np.asarray(b, np.float64) > target).astype(np.float64)


def band_greater_than_equal(b, target: float):
    return (np.asarray(b, np.float64) >= target).astype(np.float64)


def band_less_than(b, target: float):
    return (np.asarray(b, np.float64) < target).astype(np.float64)


def band_less_than_equal(b, target: float):
    return (np.asarray(b, np.float64) <= target).astype(np.float64)


def band_logical_difference(b1, b2):
    """value from band1 where bands differ, else 0 (MapAlgebra.scala:672)."""
    b1 = np.asarray(b1, np.float64)
    b2 = np.asarray(b2, np.float64)
    return np.where(b1 != b2, b1, 0.0)


def band_logical_over(b1, b2):
    """band1 where band1 != 0, else band2 (MapAlgebra.scala:~719)."""
    b1 = np.asarray(b1, np.float64)
    b2 = np.asarray(b2, np.float64)
    return np.where(b1 != 0.0, b1, b2)


def band_normalized_difference(b1, b2):
    """(b2-b1)/(b2+b1) with the reference's 0 -> -1 substitution and
    2-decimal rounding (MapAlgebra.scala:47-58)."""
    b1 = np.asarray(b1, np.float64).copy()
    b2 = np.asarray(b2, np.float64).copy()
    b1[b1 == 0] = -1
    b2[b2 == 0] = -1
    return _scala_round2((b2 - b1) / (b2 + b1))


def band_normalize(b):
    """Scale to 0..255 with int truncation (MapAlgebra.scala:752-758)."""
    b = np.asarray(b, np.float64)
    return np.trunc(b / (b.max() / 255.0)).astype(np.float64)


def band_mean(b):
    return float(_scala_round2(np.asarray(b, np.float64).mean()))


def band_mode(b):
    """ALL values tied at the highest multiplicity (MapAlgebra.scala:104),
    in first-appearance order like Scala's groupBy."""
    b = np.asarray(b, np.float64)
    vals, first, counts = np.unique(b, return_index=True, return_counts=True)
    best = counts.max()
    sel = counts == best
    order = np.argsort(first[sel], kind="mergesort")
    return vals[sel][order]


def band_count_value(b, target: float) -> int:
    return int((np.asarray(b, np.float64) == target).sum())


def band_get_band(data, target_band: int, total_bands: int):
    """Slice band #target_band (1-based) out of a flattened multi-band
    array (IO.scala:95)."""
    data = np.asarray(data, np.float64)
    size = len(data) // total_bands
    return data[(target_band - 1) * size : target_band * size]


def band_array(length: int, value: float):
    return np.full(int(length), float(value))


def band_append(data, new_band, n_bands: int):
    """Concat a new band to flattened band data (MapAlgebra.scala:776)."""
    data = np.asarray(data, np.float64)
    new_band = np.asarray(new_band, np.float64)
    if len(new_band) != len(data) // n_bands:
        raise ValueError("new band length must equal the existing band length")
    return np.concatenate([data, new_band])


def band_fetch_region(band, coordinates, dim):
    """Row-major region [minX..maxX][minY..maxY] of a flattened band
    (MapAlgebra.scala:133: index = i*dim[0] + j)."""
    band = np.asarray(band, np.float64)
    x0, y0, x1, y1 = (int(c) for c in coordinates)
    w = int(dim[0])
    rows = [band[i * w + y0 : i * w + y1 + 1] for i in range(x0, x1 + 1)]
    return np.concatenate(rows)


def band_base64(band, width: int, height: int) -> str:
    """Band rendered as a grayscale PNG, base64-encoded (IO.scala:160 uses
    java.awt; we render through the pure-python PNG encoder — same
    grayscale content, not byte-identical to awt output)."""
    import base64

    from .viz import png_encode_rgb

    g = np.clip(np.asarray(band, np.float64).reshape(height, width), 0, 255).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    return base64.b64encode(png_encode_rgb(rgb)).decode()


def band_html(band, width: int, height: int) -> str:
    """data-URI <img> tag around the base64 PNG (IO.scala:240)."""
    return f"<img src=\"data:image/png;base64,{band_base64(band, width, height)}\" width=\"200\" />"


# name registry: every RS_ name in the reference Catalog.scala -> kernel
from . import raster as _raster  # noqa: E402
from .geotiff import decode_geotiff as _dec, encode_geotiff as _enc  # noqa: E402

RS_FUNCTIONS = {
    "add": band_add,
    "subtract": band_subtract,
    "multiply": band_multiply,
    "divide": band_divide,
    "multiplyfactor": band_multiply_factor,
    "modulo": band_modulo,
    "squareroot": band_square_root,
    "bitwiseand": band_bitwise_and,
    "bitwiseor": band_bitwise_or,
    "greaterthan": band_greater_than,
    "greaterthanequal": band_greater_than_equal,
    "lessthan": band_less_than,
    "lessthanequal": band_less_than_equal,
    "logicaldifference": band_logical_difference,
    "logicalover": band_logical_over,
    "normalizeddifference": band_normalized_difference,
    "normalize": band_normalize,
    "mean": band_mean,
    "mode": band_mode,
    "count": band_count_value,
    "getband": band_get_band,
    "array": band_array,
    "append": band_append,
    "fetchregion": band_fetch_region,
    "base64": band_base64,
    "html": band_html,
    "fromgeotiff": _raster.from_geotiff,
    "asgeotiff": _raster.as_geotiff,
    "fromarcinfoasciigrid": _raster.from_arc_grid,
    "asarcgrid": _raster.as_arc_grid,
    "makeemptyraster": _raster.make_empty_raster,
    "envelope": _raster.rs_envelope,
    "metadata": _raster.rs_metadata,
    "numbands": _raster.rs_num_bands,
    "srid": _raster.rs_srid,
    "setsrid": _raster.rs_set_srid,
    "value": _raster.rs_value,
    "values": _raster.rs_value,
    "bandasarray": _raster.rs_band_as_array,
    "addbandfromarray": _raster.rs_add_band_from_array,
}
