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
