"""Driver contract: entry() smoke, queries() per-operator pipelines, and
oracle_sql() DuckDB equivalents (run side-by-side at sf=0.01).

Design notes for oracle parity (the driver hashes sorted values):
* every computed float that reaches an output is either (a) produced by the
  bit-identical expression tree in numpy and SQL (geocode arithmetic, grid
  cells, alpha_ratio) or (b) an order-insensitive exact value (min/max,
  integer sums/counts); raw distances / cosines are ranked on, never output
* spatial predicates are evaluated on axis-aligned zone squares whose
  membership SQL expresses as BETWEEN — the geometry kernel is exercised,
  the oracle stays expressible
* Ray is initialised by the driver; nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from incubator_sedona_ray.conf import SpatialConf
from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.core import GeometryType
from incubator_sedona_ray.geom import ops as _gops
from incubator_sedona_ray.geom import wkb as _wkb
from incubator_sedona_ray.encoders import geohash as _geohash, grid as _grid, h3lite as _h3, s2 as _s2
from incubator_sedona_ray.join import (
    broadcast_spatial_join,
    knn_join,
    knn_query,
    range_query,
    spatial_join,
)
from incubator_sedona_ray.raster.tile import (
    encode_pixel_id,
    heatmap_counts,
    pixel_to_tile,
    tile_assign_batch_fn,
    world_to_pixel,
)
from incubator_sedona_ray.text.geocode import geocode_docs_batch, sql_exprs
from incubator_sedona_ray.text.analysis import LangId, fingerprint_fn, quality_fn, token_count_fn
from incubator_sedona_ray.dedup import dedup_exact, minhash_dedup, simhash_batch_fn
from incubator_sedona_ray.ann import topk_cosine, topk_cosine_lsh
from incubator_sedona_ray.sources.multimodal import DecodeImage, payload_meta_fn
from incubator_sedona_ray.pipelines import flagship_pipeline

# ---------------------------------------------------------------------------
# shared constants (mirrored literally in the SQL below)
# ---------------------------------------------------------------------------

GRID_LEVEL = 6
ZN_X, ZN_Y, ZN_STEP, ZN_SIDE = 18, 9, 20.0, 15.0  # zone lattice
RANGE_BOX = (-90.0, 0.0, 0.0, 45.0)
DIST_MOD, DIST_RADIUS = 4, 15.005  # no lattice distance within 3e-6 of radius
KNN_QUERIES = [(0, -60.0, -30.0), (1, -20.0, -10.0), (2, 20.0, 10.0), (3, 60.0, 30.0)]
KNN_K = 5
TILE_RES_X, TILE_RES_Y, TILE_PX, TILE_PY = 1024, 512, 8, 8
HM_RES_X, HM_RES_Y = 256, 128
WORLD = (-180.0, -90.0, 180.0, 90.0)
ANN_K, ANN_NQ = 10, 4
EMB_DUP_THRESHOLD = 0.4
SESSION_GAP_US = 30 * 60 * 1_000_000

LON_SQL, LAT_SQL = sql_exprs("doc_id")


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _geo_docs(sf_dir: str):
    return _docs(sf_dir, columns=["doc_id"]).map_batches(geocode_docs_batch, batch_format="pyarrow")


def _rename(ds, mapping: dict[str, str]):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


def _zones_table() -> pa.Table:
    ids, wkbs = [], []
    for xi in range(ZN_X):
        for yi in range(ZN_Y):
            x0 = -180.0 + ZN_STEP * xi
            y0 = -90.0 + ZN_STEP * yi
            ids.append(xi * ZN_Y + yi)
            wkbs.append(_wkb.to_wkb(Geometry.box(x0, y0, x0 + ZN_SIDE, y0 + ZN_SIDE)))
    return pa.table({"zone_id": pa.array(ids, type=pa.int64()), "geom": pa.array(wkbs, type=pa.binary())})


_ZONES_SQL = f"""
  SELECT (xi * {ZN_Y} + yi) AS zone_id,
         (-180.0 + {ZN_STEP} * xi) AS x0,
         (-90.0 + {ZN_STEP} * yi) AS y0
  FROM range({ZN_X}) tx(xi), range({ZN_Y}) ty(yi)
"""
_PTS_SQL = f"SELECT doc_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_geocode(sf_dir: str):
    return _geo_docs(sf_dir)


def q_grid_cells(sf_dir: str):
    def add_cell(batch: pa.Table) -> pa.Table:
        cell = _grid.cell_ids(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            GRID_LEVEL,
        )
        return pa.table({"doc_id": batch["doc_id"], "cell_id": pa.array(cell)})

    return _geo_docs(sf_dir).map_batches(add_cell, batch_format="pyarrow")


def q_range_query(sf_dir: str):
    win = Geometry.box(*RANGE_BOX)
    return range_query(_geo_docs(sf_dir), win, "covers", geom=("lon", "lat"))


def q_pip_join(sf_dir: str):
    zones = ray.data.from_arrow(_zones_table())
    joined = spatial_join(
        zones,
        _geo_docs(sf_dir),
        "covers",
        left_geom="geom",
        right_geom=("lon", "lat"),
        num_partitions=8,
        conf=SpatialConf(grid_type="kdbtree"),
    )
    return _rename(joined.select_columns(["l_zone_id", "r_doc_id"]), {"l_zone_id": "zone_id", "r_doc_id": "doc_id"})


def q_pip_join_broadcast(sf_dir: str):
    out = broadcast_spatial_join(
        _geo_docs(sf_dir),
        _zones_table(),
        "covered_by",
        big_geom=("lon", "lat"),
        small_geom="geom",
        how="inner",
        small_prefix="z_",
    )
    return _rename(out.select_columns(["z_zone_id", "doc_id"]), {"z_zone_id": "zone_id"})


def q_pip_join_gc(sf_dir: str):
    """Partitioned PIP join with GEOMETRYCOLLECTION windows — the checker
    world's collection variant (VERDICT r03 #3): each zone square becomes
    a collection of its SW and NE quadrant boxes (odd zones additionally
    NESTED one level), so every candidate pair exercises the vectorized
    explode path (join/spatial_join.py fast path E) — no per-row generic
    fallback. Oracle: point in either quadrant box (closed form)."""
    ids, wkbs = [], []
    h = ZN_SIDE / 2.0
    for xi in range(ZN_X):
        for yi in range(ZN_Y):
            x0 = -180.0 + ZN_STEP * xi
            y0 = -90.0 + ZN_STEP * yi
            zid = xi * ZN_Y + yi
            sw = Geometry.box(x0, y0, x0 + h, y0 + h)
            ne = Geometry.box(x0 + h, y0 + h, x0 + ZN_SIDE, y0 + ZN_SIDE)
            gcol = GeometryType.GEOMETRYCOLLECTION
            g = (
                Geometry(gcol, [sw, ne], 0)
                if zid % 2 == 0
                else Geometry(gcol, [Geometry(gcol, [sw], 0), ne], 0)
            )
            ids.append(zid)
            wkbs.append(_wkb.to_wkb(g))
    zones = ray.data.from_arrow(
        pa.table({"zone_id": pa.array(ids, type=pa.int64()), "geom": pa.array(wkbs, type=pa.binary())})
    )
    joined = spatial_join(
        zones,
        _geo_docs(sf_dir),
        "covers",
        left_geom="geom",
        right_geom=("lon", "lat"),
        num_partitions=8,
        conf=SpatialConf(grid_type="quadtree"),
    )
    return _rename(joined.select_columns(["l_zone_id", "r_doc_id"]), {"l_zone_id": "zone_id", "r_doc_id": "doc_id"})


def q_poly_join(sf_dir: str):
    """Polygon-x-polygon intersects join (the vectorized fast path D,
    ``join/spatial_join.py _poly_poly_intersects``): each document becomes
    a box of per-doc half-width around its geocoded point (vectorized
    ``boxes_to_wkb``), broadcast-joined against the zone squares. The
    oracle is the closed-form box-overlap predicate."""
    from incubator_sedona_ray.geom.wkb import boxes_to_wkb

    def boxify(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w = 0.5 + 0.5 * (ids % 4).astype(np.float64)
        wkb = boxes_to_wkb(lon - w, lat - w, lon + w, lat + w)
        return pa.table({"doc_id": b["doc_id"], "geom": pa.array(list(wkb), type=pa.binary())})

    boxes = _geo_docs(sf_dir).map_batches(boxify, batch_format="pyarrow")
    out = broadcast_spatial_join(
        boxes,
        _zones_table(),
        "intersects",
        big_geom="geom",
        small_geom="geom",
        how="inner",
        small_prefix="z_",
    )
    return _rename(out.select_columns(["z_zone_id", "doc_id"]), {"z_zone_id": "zone_id"})


def q_pip_join_count(sf_dir: str):
    counts = q_pip_join(sf_dir).groupby("zone_id").count()
    return _rename(counts, {"count()": "n_docs"})


CHORO_RES_X, CHORO_RES_Y = 256, 128


def q_choropleth(sf_dir: str):
    """ChoroplethMap pixel weights: each (disjoint) zone square filled with
    its PIP doc count — strict pixel-space-interior fill per
    RasterizationUtils:323-357 — then summed per pixel. The render tail is
    pinned separately (tile_render); the pixel weights here have a
    closed-form SQL oracle."""
    from incubator_sedona_ray.raster.rasterize import _pixel_sum, rasterize_batch_fn

    counts = q_pip_join_count(sf_dir).to_pandas()  # 162 rows — the small side
    zones = _zones_table().to_pandas()
    merged = zones.merge(counts, on="zone_id", how="inner")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "geom": pa.array(list(merged["geom"]), type=pa.binary()),
                "value": pa.array(merged["n_docs"].astype(np.float64)),
            }
        )
    )
    pix = _pixel_sum(
        ds.map_batches(
            rasterize_batch_fn(WORLD, CHORO_RES_X, CHORO_RES_Y, weight_col="value", fill=True),
            batch_format="pyarrow",
        ),
        res_x=CHORO_RES_X, res_y=CHORO_RES_Y,
    )
    return pix


def q_scatter_zones(sf_dir: str):
    """ScatterPlot pixel weights over the zone squares: Bresenham outline
    rasterization (axis-parallel edges -> straight pixel runs), per-zone
    pixel dedup, count per pixel where outlines overlap. Closed-form SQL
    oracle via unioned pixel ranges."""
    from incubator_sedona_ray.raster.rasterize import _pixel_sum, rasterize_batch_fn

    zones = ray.data.from_arrow(_zones_table())
    pix = _pixel_sum(
        zones.map_batches(
            rasterize_batch_fn(WORLD, CHORO_RES_X, CHORO_RES_Y, fill=False), batch_format="pyarrow"
        ),
        res_x=CHORO_RES_X, res_y=CHORO_RES_Y,
    )
    return pix


def q_distance_join(sf_dir: str):
    def subset(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % DIST_MOD == 0))

    pts = _geo_docs(sf_dir).map_batches(subset, batch_format="pyarrow")
    joined = spatial_join(
        pts,
        pts,
        radius=DIST_RADIUS,
        left_geom=("lon", "lat"),
        right_geom=("lon", "lat"),
        num_partitions=4,
    )

    def ordered(batch: pa.Table) -> pa.Table:
        a = batch["l_doc_id"].to_numpy(zero_copy_only=False)
        b = batch["r_doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(a < b))
        return pa.table({"a_id": t["l_doc_id"], "b_id": t["r_doc_id"]})

    return joined.map_batches(ordered, batch_format="pyarrow")


def q_knn_join(sf_dir: str):
    queries = pd.DataFrame(KNN_QUERIES, columns=["query_id", "qx", "qy"])
    out = knn_join(
        _geo_docs(sf_dir), queries, k=KNN_K, right_geom=("lon", "lat"), right_id="doc_id"
    )
    return out.select_columns(["query_id", "doc_id", "rank"])


def q_knn_query(sf_dir: str):
    out = knn_query(_geo_docs(sf_dir), Geometry.point(0.0, 0.0), k=10, id_col="doc_id").to_pandas()
    out = out.sort_values(["dist", "doc_id"], kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({"doc_id": out.doc_id, "rank": np.arange(1, len(out) + 1, dtype=np.int64)})


def q_tile_assign(sf_dir: str):
    out = _geo_docs(sf_dir).map_batches(
        tile_assign_batch_fn(WORLD, TILE_RES_X, TILE_RES_Y, TILE_PX, TILE_PY),
        batch_format="pyarrow",
    )
    return out.select_columns(["doc_id", "pixel_x", "pixel_y", "tile_id"])


def q_zonal_tile_stats(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    docs = _docs(sf_dir, columns=["doc_id", "n_chars"]).map_batches(
        geocode_docs_batch, batch_format="pyarrow"
    )
    tiled = docs.map_batches(
        tile_assign_batch_fn(WORLD, TILE_RES_X, TILE_RES_Y, TILE_PX, TILE_PY),
        batch_format="pyarrow",
    )
    out = tiled.groupby("tile_id").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )

    def _cast(batch: "pa.Table") -> "pa.Table":
        # Pin aggregate dtypes so the driver's typed value-hash matches the
        # oracle (DuckDB SUM(BIGINT) surfaces as hugeint/float otherwise).
        idx = batch.schema.get_field_index("sum_chars")
        return batch.set_column(idx, "sum_chars", batch["sum_chars"].cast(pa.int64()))

    return out.map_batches(_cast, batch_format="pyarrow")


def q_envelope_aggr(sf_dir: str):
    from ray.data.aggregate import Max, Min

    row = _geo_docs(sf_dir).aggregate(Min("lon"), Min("lat"), Max("lon"), Max("lat"))
    return pd.DataFrame(
        [
            {
                "min_lon": row["min(lon)"],
                "min_lat": row["min(lat)"],
                "max_lon": row["max(lon)"],
                "max_lat": row["max(lat)"],
            }
        ]
    )


def q_heatmap(sf_dir: str):
    hm = heatmap_counts(_geo_docs(sf_dir), WORLD, HM_RES_X, HM_RES_Y, 4, 4)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pixel_id": batch["pixel_id"],
                "weight": batch["weight"].cast(pa.int64()),
            }
        )

    return hm.map_batches(shape, batch_format="pyarrow")


def q_heatmap_weighted(sf_dir: str):
    """Weighted per-pixel aggregation through the shuffle-free dense-grid
    reduce (weight mode carries the parallel presence counter). Integer
    weights keep float64 sums exact, so the SQL SUM is bit-identical."""

    def addw(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "w", pa.array((ids % 7 + 1).astype(np.float64), type=pa.float64())
        )

    src = _geo_docs(sf_dir).map_batches(addw, batch_format="pyarrow")
    hm = heatmap_counts(src, WORLD, HM_RES_X, HM_RES_Y, 4, 4, weight_col="w")

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pixel_id": batch["pixel_id"],
                "weight": batch["weight"].cast(pa.int64()),
            }
        )

    return hm.map_batches(shape, batch_format="pyarrow")


def q_st_zone_stats(sf_dir: str):
    rows = []
    t = _zones_table()
    for zid, blob in zip(t["zone_id"].to_pylist(), t["geom"].to_pylist()):
        g = _wkb.from_wkb(blob)
        c = _gops.centroid(g)
        rows.append(
            {
                "zone_id": zid,
                "area": _gops.area(g),
                "perimeter": _gops.length(g),
                "cx": float(c.coords[0]),
                "cy": float(c.coords[1]),
            }
        )
    return pd.DataFrame(rows)


def q_st_accessors(sf_dir: str):
    """Accessor-family ST_ functions over the zone layer: exterior ring,
    point-N, start point, ring/hole/vertex counts, dimension, minimum
    bounding radius — each value checkable in closed form by the oracle."""
    from incubator_sedona_ray.functions.st import (
        st_dimension, st_exteriorring, st_minimumboundingradius, st_npoints,
        st_nrings, st_numinteriorrings, st_pointn, st_startpoint, st_x, st_y,
    )

    zones = ray.data.from_arrow(_zones_table())

    def fn(t: pa.Table) -> pa.Table:
        ring = st_exteriorring(t["geom"])
        sp = st_startpoint(ring)
        p3 = st_pointn(ring, 3)
        mbr = st_minimumboundingradius(t["geom"])
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "sx": st_x(sp),
                "sy": st_y(sp),
                "p3x": st_x(p3),
                "p3y": st_y(p3),
                "n_points": st_npoints(t["geom"]).cast(pa.int64()),
                "n_rings": st_nrings(t["geom"]).cast(pa.int64()),
                "n_holes": st_numinteriorrings(t["geom"]).cast(pa.int64()),
                "dim": st_dimension(t["geom"]).cast(pa.int64()),
                "mbr_radius": mbr.field("radius"),
            }
        )

    return zones.map_batches(fn, batch_format="pyarrow")


def q_dedup_exact(sf_dir: str):
    return dedup_exact(_docs(sf_dir, columns=["doc_id", "text"]))


def q_token_count(sf_dir: str):
    out = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(token_count_fn(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens"])


def q_bpe_token_count(sf_dir: str):
    """GPT-2-style pre-tokenizer token counts (letter runs / <=3-digit runs
    / punctuation) — the LLM-token-count proxy; closed-form regex oracle."""
    from incubator_sedona_ray.text.analysis import _BPEISH

    def fn(batch: pa.Table) -> pa.Table:
        counts = pa.array(
            [len(_BPEISH.findall(t)) for t in batch["text"].to_pylist()], type=pa.int64()
        )
        return batch.append_column("n_bpe_tokens", counts)

    out = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_bpe_tokens"])


def q_quality(sf_dir: str):
    out = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(quality_fn(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_chars_q", "n_alpha", "n_digits", "n_spaces", "alpha_ratio"])


def q_lang_count(sf_dir: str):
    out = _docs(sf_dir, columns=["doc_id", "lang"]).groupby("lang").count()
    return _rename(out, {"count()": "n"})


def q_pii_redact(sf_dir: str):
    """PII scrub (C4/Gopher prep pass): deterministic PII is planted into
    each document (email/IPv4/phone derived from doc_id — the corpus has
    none of its own), then redacted by the Arrow RE2 rule chain. Counts are
    taken on the running text exactly as the rules apply, and the oracle
    replays the identical patterns through DuckDB's RE2."""
    from incubator_sedona_ray.text.redact import redact_pii

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        suffix = pa.array(
            [
                f" contact user{int(i)}@example.com or 10.0.{int(i) % 256}.7 call +1 555 000{int(i) % 10}"
                for i in ids
            ]
        )
        text = pc.binary_join_element_wise(batch["text"], suffix, "")
        return batch.set_column(batch.schema.get_field_index("text"), "text", text)

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(plant, batch_format="pyarrow")
    out = redact_pii(ds)
    return out.select_columns(["doc_id", "text", "n_email", "n_ip", "n_phone"])


def q_repetition(sf_dir: str):
    """Gopher-style repetition scores (dup-word / top-word / dup-2-gram
    fractions) — vectorized dictionary-encode + lexsort kernels, closed-form
    list-function oracle."""
    from incubator_sedona_ray.text.repetition import repetition_scores

    out = repetition_scores(_docs(sf_dir, columns=["doc_id", "text"]))
    return out.select_columns(
        ["doc_id", "n_words", "dup_word_frac", "top_word_frac", "dup_2gram_frac"]
    )


def q_paragraph_dedup(sf_dir: str):
    """Corpus-level exact paragraph dedup (Lee et al. 2021): documents are
    given a deterministic 12-word line structure, every repeated line keeps
    only its first (doc_id, position) occurrence corpus-wide, and documents
    are rebuilt from their survivors (empty documents drop out)."""
    from incubator_sedona_ray.dedup.paragraph import chunk_into_lines_fn, dedup_paragraphs

    lined = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        chunk_into_lines_fn(12), batch_format="pyarrow"
    )
    return dedup_paragraphs(lined).select_columns(["doc_id", "text"])


def q_lm_familiarity(sf_dir: str):
    """CCNet-style corpus-fit quality score: a bigram model is fitted on
    the corpus itself (explode -> local Arrow combine -> one groupby-sum,
    singleton-pruned), then every document is scored by the mean corpus
    count of its bigrams via a distributed hash join (the model is a
    Dataset — never broadcast or collected). Integer-exact arithmetic, so
    the SQL oracle matches bit-for-bit."""
    from incubator_sedona_ray.text.lm import familiarity_scores

    out = familiarity_scores(_docs(sf_dir, columns=["doc_id", "text"]))
    return out.select_columns(["doc_id", "n_bigrams", "familiarity"])


LM_SCALE = 10**6


def q_lm_backoff(sf_dir: str):
    """Conditional stupid-backoff LM scoring (text/backoff_lm.py; Brants
    2007 / the quantity CCNet's perplexity filter thresholds): bigram +
    unigram count tables trained on the corpus (fnv-bucketed group-sums),
    then every document scored by the integer mean fixed-point
    p(w2|w1) = cnt2*scale // cnt1, backing off to (2*cnt(w2)*scale) //
    (5*T) for unseen bigrams (alpha = 2/5 exactly — rational, so the SQL
    oracle matches bit-for-bit). Broadcast mode: one zero-shuffle scoring
    pass over index_in lookups."""
    from incubator_sedona_ray.text.backoff_lm import lm_score, ngram_lm_train

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    model = ngram_lm_train(docs)
    return lm_score(docs, model, scale=LM_SCALE, mode="broadcast")


def q_lm_backoff_join(sf_dir: str):
    """Same scores, FORCED join mode — the 100 TB path where the bigram
    table is billions of rows: seen pairs inner-join the count tables,
    unseen pairs anti-join then backoff-join the unigram table, and one
    bucketed per-doc integer sum finishes (no broadcast, no outer join).
    Bit-identical to the broadcast mode."""
    from incubator_sedona_ray.text.backoff_lm import lm_score, ngram_lm_train

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    model = ngram_lm_train(docs)
    return lm_score(docs, model, scale=LM_SCALE, mode="join")


def _lm_backoff_sql() -> str:
    """The stupid-backoff recurrence in closed form: the same whitespace
    tokenization, self-trained counts, and BIGINT floor divisions as
    text/backoff_lm.py — bit-exact, including the n_pairs denominator
    and zero-pair documents."""
    S = LM_SCALE
    return (
        r"WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS a "
        "FROM documents), "
        "tot AS (SELECT coalesce(sum(len(a)), 0) AS t FROM toks), "
        "uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(a) AS w FROM toks) GROUP BY w), "
        "pr AS (SELECT doc_id, unnest(range(1, len(a))) AS i, a FROM toks WHERE len(a) >= 2), "
        "pairs AS (SELECT doc_id, a[i] AS w1, a[i+1] AS w2 FROM pr), "
        "bi AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2), "
        "ps AS (SELECT p.doc_id, "
        f"CASE WHEN b.c IS NOT NULL THEN (b.c * {S}) // u1.c "
        f"WHEN u2.c IS NOT NULL THEN (2 * u2.c * {S}) // (5 * (SELECT t FROM tot)) "
        "ELSE 0 END AS pfp "
        "FROM pairs p LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2 "
        "LEFT JOIN uni u1 ON p.w1 = u1.w LEFT JOIN uni u2 ON p.w2 = u2.w), "
        "sc AS (SELECT doc_id, count(*) AS n_pairs, sum(pfp) AS s FROM ps GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(coalesce(sc.n_pairs, 0) AS BIGINT) AS n_pairs, "
        "CAST(CASE WHEN coalesce(sc.n_pairs, 0) > 0 THEN sc.s // sc.n_pairs ELSE 0 END AS BIGINT) AS score_fp "
        "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"
    )


def _synth_url_variants_fn(batch: pa.Table) -> pa.Table:
    """Recrawl/variant synthesis for the URL-dedup query: the flagship URL
    per doc, plus a tracking-param recrawl (+1h) for doc_id%3==0 and an
    uppercase-host trailing-slash recrawl (+2h) for doc_id%5==0 — all
    closed-form in doc_id so the oracle unions the same three selects."""
    from incubator_sedona_ray.pipelines.pages import _BASE_TS, _LANG_TLDS

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, tss, out_ids = [], [], []
    for i, lang, src in zip(ids, langs, sources):
        i = int(i)
        tlds = _LANG_TLDS.get(lang, ["com"])
        dom = f"{src}-{i}.{tlds[i % len(tlds)]}"
        base_ts = _BASE_TS + np.timedelta64(i, "s")
        urls.append(f"https://{dom}/p/{i}")
        tss.append(base_ts)
        out_ids.append(i)
        if i % 3 == 0:
            urls.append(f"https://{dom}/p/{i}?utm_source=feed&utm_campaign=c{i % 7}")
            tss.append(base_ts + np.timedelta64(1, "h"))
            out_ids.append(i)
        if i % 5 == 0:
            urls.append(f"HTTPS://{dom.upper()}/p/{i}/")
            tss.append(base_ts + np.timedelta64(2, "h"))
            out_ids.append(i)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]")),
        }
    )


def q_url_dedup(sf_dir: str):
    """URL canonicalize + keep-latest-capture dedup over a synthesized
    recrawl stream (url, warc_ts): canonical form strips query/fragment,
    lowercases scheme+host, strips a trailing slash; per canonical URL the
    row with max warc_ts (ties: min raw url) survives."""
    from incubator_sedona_ray.text.urls import dedup_urls

    pages = _docs(sf_dir, columns=["doc_id", "lang", "source"]).map_batches(
        _synth_url_variants_fn, batch_format="pyarrow"
    )
    out = dedup_urls(pages, url_col="url", ts_col="warc_ts")
    return out.select_columns(["canon_url", "url", "warc_ts", "doc_id"])


def q_decontam(sf_dir: str):
    """Test-set decontamination report (Brown et al. 2020 §C): held-out set
    = docs with doc_id % 37 == 0; every other doc sharing a word 4-gram
    with it is flagged with its distinct-overlap count. Broadcast mode —
    the held-out side collapses to a sorted hash array shipped once, so
    the train side streams with ZERO shuffles."""
    from incubator_sedona_ray.text.decontam import contamination_report

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _split(test: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy(zero_copy_only=False) % 37 == 0
            return b.filter(pa.array(m if test else ~m))

        return fn

    test = docs.map_batches(_split(True), batch_format="pyarrow")
    train = docs.map_batches(_split(False), batch_format="pyarrow")
    return contamination_report(train, test, n=4)


def q_dup_spans(sf_dir: str):
    """Duplicate-span report (dedup/spans.py, ExactSubstr family — Lee et
    al. 2021): per document, how many of its DISTINCT word 4-grams occur
    verbatim in >=2 documents. Two uniform FNV-hash-keyed shuffles (gram
    document-frequency groupby + pairs-x-dup-grams hash join); docs with
    zero shared spans never leave the join."""
    from incubator_sedona_ray.dedup.spans import dup_span_report

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return dup_span_report(docs, n=4, min_docs=2)


def q_dup_span_removal(sf_dir: str):
    """ExactSubstr span REMOVAL (dedup/spans.py remove_dup_spans — the
    Lee et al. 2021 step that actually cuts duplicated text out of every
    document): tokens covered by a word 4-gram shared verbatim by >=2
    docs are removed; output is the space-joined normalized remainder.
    Two coarse exchanges, no join: the gram-hash bucket kernel computes
    distinct-doc df AND emits duplicated start positions in one pass,
    then a doc-bucket kernel rebuilds the text."""
    from incubator_sedona_ray.dedup.spans import remove_dup_spans

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return remove_dup_spans(docs, n=4, min_docs=2)


def _dup_span_removal_sql() -> str:
    """Token-level span removal in closed form: positions of duplicated
    4-gram starts via a distinct-doc df, coverage by UNNEST(range), and
    string_agg(... ORDER BY pos) for the remainder — identical
    tokenization and semantics to remove_dup_spans."""
    n = 4
    gram = " || ' ' || ".join(f"a[i+{d}]" for d in range(n))
    return (
        r"WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS a "
        "FROM documents), "
        f"gr AS (SELECT doc_id, unnest(range(1, len(a) - {n} + 2)) AS i, a FROM toks WHERE len(a) >= {n}), "
        f"gs AS (SELECT doc_id, i, {gram} AS g FROM gr), "
        "df AS (SELECT g, count(DISTINCT doc_id) AS d FROM gs GROUP BY g), "
        "ds AS (SELECT gs.doc_id, gs.i FROM gs JOIN df ON gs.g = df.g WHERE df.d >= 2), "
        f"cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + {n})) AS k FROM ds), "
        "tok AS (SELECT t.doc_id, u.i AS pos, t.a[u.i] AS w FROM toks t, UNNEST(range(1, len(t.a) + 1)) u(i)), "
        "kept AS (SELECT tok.doc_id, tok.pos, tok.w FROM tok LEFT JOIN cov "
        "ON tok.doc_id = cov.doc_id AND tok.pos = cov.k WHERE cov.doc_id IS NULL), "
        "agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS txt FROM kept GROUP BY doc_id), "
        "nc AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY doc_id) "
        "SELECT t.doc_id, coalesce(agg.txt, '') AS text_clean, "
        "CAST(len(t.a) AS BIGINT) AS n_tokens, CAST(coalesce(nc.c, 0) AS BIGINT) AS n_removed "
        "FROM toks t LEFT JOIN agg ON t.doc_id = agg.doc_id LEFT JOIN nc ON t.doc_id = nc.doc_id"
    )


def _synth_linked_pages_fn(batch: pa.Table) -> pa.Table:
    """Pages with a deterministic anchor mix for the link-extraction query:
    one absolute external href, one root-relative href, three unresolvable
    ones (mailto:, fragment, directory-relative) that extraction must DROP,
    plus an extra http:// anchor for doc_id%4==0 — all closed-form in
    doc_id so the oracle rebuilds the identical html string in SQL and
    regexp-extracts it."""
    from incubator_sedona_ray.pipelines.pages import _LANG_TLDS

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, htmls = [], []
    for i, lang, src in zip(ids, langs, sources):
        i = int(i)
        tlds = _LANG_TLDS.get(lang, ["com"])
        urls.append(f"https://{src}-{i}.{tlds[i % len(tlds)]}/p/{i}")
        ext = (i * 7 + 13) % 101
        rel = (i * 3 + 1) % 997
        h = (
            f'<html><body><a href="https://ext-{ext}.example/p/{ext}">x</a><p>t</p>'
            f'<a href="/p/{rel}">y</a><a href="mailto:admin@example.com">m</a>'
            f'<a href="#top">t</a><a href="about.html">r</a>'
        )
        if i % 4 == 0:
            h += f'<a href="http://mirror.example/{i}">z</a>'
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "html": pa.array(htmls, type=pa.binary()),
        }
    )


def q_extract_links(sf_dir: str):
    """Crawl-graph edge extraction (text/links.py): vectorized href harvest
    from html:binary — split on href=\" + one RE2 head per fragment, then
    resolve absolute/root-relative targets against the source origin and
    drop mailto:/fragment/directory-relative anchors. Zero shuffles."""
    from incubator_sedona_ray.text.links import extract_links

    pages = _docs(sf_dir, columns=["doc_id", "lang", "source"]).map_batches(
        _synth_linked_pages_fn, batch_format="pyarrow"
    )
    return extract_links(pages)


def q_linreg_quality(sf_dir: str):
    """Exact distributed OLS (ml/linreg.py): regress n_chars on
    (n_tokens, count of 'e') with intercept — integer sufficient
    statistics X'X / X'y as one mergeable map-side row per batch + one
    global Sum, then the shared-expression Cramer solve, bit-equal to the
    SQL oracle running the identical float64 expressions."""
    from incubator_sedona_ray.ml.linreg import linear_fit_exact
    from incubator_sedona_ray.text.packing import count_tokens_batch

    def feats(b: pa.Table) -> pa.Table:
        b = count_tokens_batch(b, text_col="text")
        e_cnt = pc.count_substring(b["text"], "e")
        return pa.table(
            {
                "n_tokens": b["n_tokens"],
                "e_count": e_cnt.cast(pa.int64()),
                "n_chars": b["n_chars"].cast(pa.int64()),
            }
        )

    docs = _docs(sf_dir, columns=["text", "n_chars"]).map_batches(
        feats, batch_format="pyarrow"
    )
    return linear_fit_exact(docs, ["n_tokens", "e_count"], "n_chars")


def _linreg_sql() -> str:
    """The oracle-side twin of q_linreg_quality: identical integer sums,
    identical (shared-text) Cramer expressions over DOUBLE-cast stats."""
    from incubator_sedona_ray.ml.linreg import cramer3_sql

    c = cramer3_sql()
    return (
        r"WITH w AS (SELECT n_chars AS y, "
        r"CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS x1, "
        "len(text) - len(replace(text, 'e', '')) AS x2 FROM documents), "
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(x1) AS DOUBLE) AS sx1, "
        "CAST(sum(x2) AS DOUBLE) AS sx2, CAST(sum(y) AS DOUBLE) AS sy, "
        "CAST(sum(x1*x1) AS DOUBLE) AS s11, CAST(sum(x1*x2) AS DOUBLE) AS s12, "
        "CAST(sum(x2*x2) AS DOUBLE) AS s22, CAST(sum(x1*y) AS DOUBLE) AS s1y, "
        "CAST(sum(x2*y) AS DOUBLE) AS s2y FROM w) "
        f"SELECT 'intercept' AS feature, ({c['det0']}) / ({c['det']}) AS beta FROM s "
        f"UNION ALL SELECT 'n_tokens', ({c['det1']}) / ({c['det']}) FROM s "
        f"UNION ALL SELECT 'e_count', ({c['det2']}) / ({c['det']}) FROM s"
    )


BPE_MERGES = 12


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (text/bpe.py, Sennrich et al.
    2016): one corpus pass for word frequencies, then 12 merge rounds over
    the distributed word table — vectorized packed-pair counting, global
    max with a deterministic tie-break, run-parity merge application.
    Parallelism-invariant by construction (tests prove equality with a
    sequential reference); oracle is the pinned sf0.01 fixture."""
    from incubator_sedona_ray.text.bpe import bpe_train

    docs = _docs(sf_dir, columns=["text"])
    return bpe_train(docs, BPE_MERGES)


def q_bpe_encode(sf_dir: str):
    """Tokenize the corpus with the LEARNED merge table (text/bpe.py
    bpe_encode_counts): train 12 merges, then one stateless streaming map
    applies them per batch (merge table rides the closure — zero shuffles
    over the corpus) and emits per-doc BPE token counts."""
    from incubator_sedona_ray.text.bpe import bpe_encode_counts, bpe_train

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    merges = bpe_train(_docs(sf_dir, columns=["text"]), BPE_MERGES)
    return bpe_encode_counts(docs, merges)


def q_link_components(sf_dir: str):
    """Connected components over a sparse synthetic link graph (chains
    doc_id—doc_id+1 broken at multiples of 7) via distributed min-label
    propagation (dedup/minhash.py connected_components_min_label: one hash
    join + groupby-min per BSP round, label-sum convergence certificate).
    The oracle is DuckDB's recursive-CTE transitive closure."""
    from incubator_sedona_ray.dedup.minhash import connected_components_min_label

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids[(ids % 7 != 0) & (ids + 1 < n)]
        return pa.table(
            {
                "a": pa.array(keep, type=pa.int64()),
                "b": pa.array(keep + 1, type=pa.int64()),
            }
        )

    pairs = docs.map_batches(mk, batch_format="pyarrow")
    out = connected_components_min_label(pairs)
    return _rename(out, {"node": "doc_id", "label": "comp"})


def q_link_components_bsp(sf_dir: str):
    """Same chain graph, compiled-topology BSP engine
    (graph/components.py): symmetrized edges CSR-compiled once, each
    round R minimum.reduceat scatters + R elementwise-min gathers on
    sharded label slices — no per-round edge re-join. Covers the FULL
    [0, n) node universe (isolated nodes label themselves), so its
    oracle's recursive closure seeds from every document."""
    from incubator_sedona_ray.graph.components import connected_components

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids[(ids % 7 != 0) & (ids + 1 < n)]
        return pa.table(
            {
                "a": pa.array(keep, type=pa.int64()),
                "b": pa.array(keep + 1, type=pa.int64()),
            }
        )

    pairs = docs.map_batches(mk, batch_format="pyarrow")
    out = connected_components(pairs, n_nodes=n, src_col="a", dst_col="b")
    return _rename(out, {"node": "doc_id", "label": "comp"})


CENTROID_QBITS = 20  # fixed-point resolution 2^-20 — makes the mean exact


def q_centroid_per_label(sf_dir: str):
    """Per-cluster embedding centroid as a MERGEABLE map-side reduction:
    each batch emits (label, dim, int64 fixed-point partial sum, count) —
    quantizing float32 components at 2^-20 makes the distributed sum
    order-independent and therefore bit-equal to the SQL oracle; one tiny
    (labels x dims)-row groupby finishes, one float division finalizes."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    from incubator_sedona_ray.ann.centroid import grouped_vector_mean

    return grouped_vector_mean(
        emb, "label", "embedding", quantize_bits=CENTROID_QBITS
    )


def q_text_normalize(sf_dir: str):
    """Unicode corpus hygiene (text/normalize.py): docs with doc_id%3==0
    get a deterministic mess appended (a C0 control char + a decomposed
    e-acute); the stage strips controls and NFC-composes — one RE2 pass +
    Arrow utf8_normalize, zero shuffles, mirrored by DuckDB
    regexp_replace + nfc_normalize."""
    from incubator_sedona_ray.text.normalize import normalize_text

    def mess(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        out = [
            (t or "") + ("\x01cafe" + "e\u0301" if int(i) % 3 == 0 else "")
            for i, t in zip(ids, texts)
        ]
        return pa.table({"doc_id": b["doc_id"], "text": pa.array(out, type=pa.string())})

    docs = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(mess, batch_format="pyarrow")
    out = normalize_text(docs)
    return out.select_columns(["doc_id", "text_norm", "changed"])


def q_extract_title(sf_dir: str):
    """Page-title harvest (text/extract.py extract_titles — the WAT-style
    metadata field): one RE2 extract per batch + whitespace collapse +
    entity decode; pages without a <title> yield ''. Synth mix: entity-
    laden titles (doc_id%2==0), messy-whitespace titles, and doc_id%7==0
    pages with no title at all."""
    from incubator_sedona_ray.text.extract import extract_titles

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        htmls = []
        for i in ids:
            i = int(i)
            if i % 7 == 0:
                body = "<html><head></head><body><p>x</p></body></html>"
            else:
                t = (
                    f"R&amp;D &lt;page {i}&gt;"
                    if i % 2 == 0
                    else f"Crawl   report\n{i}"
                )
                body = f"<html><head><title>{t}</title></head><body><p>x</p></body></html>"
            htmls.append(body.encode())
        return pa.table(
            {"doc_id": b["doc_id"], "html": pa.array(htmls, type=pa.binary())}
        )

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(mk, batch_format="pyarrow")
    return extract_titles(pages).select_columns(["doc_id", "title"])


def q_anchor_stats(sf_dir: str):
    """WAT-style anchor aggregation (text/links.py anchor_stats): harvest
    (dst_url, anchor text) pairs from the synthetic anchored pages, then
    one dst-keyed groupby -> in-link count + lexicographically smallest
    non-empty anchor per destination."""
    from incubator_sedona_ray.text.links import anchor_stats

    pages = _docs(sf_dir, columns=["doc_id", "lang", "source"]).map_batches(
        _synth_linked_pages_fn, batch_format="pyarrow"
    )
    return anchor_stats(pages)


IPGEO_MULT = 2654435761


def q_ip_geo_join(sf_dir: str):
    """Geo-IP-style enrichment (join/interval.py): each doc gets a synthetic
    uint32 ip (Knuth multiplicative hash of doc_id); a 48-range table (64
    x 2^26 buckets, every 4th missing) broadcasts once and the corpus
    streams through a searchsorted probe — the 1-D non-equi join class
    (SQL: BETWEEN), zero shuffles."""
    from incubator_sedona_ray.join.interval import interval_join

    def add_ip(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ip = (ids * IPGEO_MULT) % (1 << 32)
        return pa.table(
            {"doc_id": b["doc_id"], "ip": pa.array(ip, type=pa.int64())}
        )

    k = np.arange(64, dtype=np.int64)
    k = k[k % 4 != 3]
    ranges = ray.data.from_arrow(
        pa.table(
            {
                "lo": pa.array(k << 26, type=pa.int64()),
                "hi": pa.array(((k + 1) << 26) - 1, type=pa.int64()),
                "geo": pa.array([f"cc-{int(x)}" for x in k], type=pa.string()),
            }
        )
    )
    docs = _docs(sf_dir, columns=["doc_id"]).map_batches(add_ip, batch_format="pyarrow")
    return interval_join(docs, ranges, point_col="ip", attr_cols=("geo",))


def q_degree_hist(sf_dir: str):
    """In-degree distribution of the synthetic link graph (graph/degrees.py
    dense-reduce: per-task bincount vectors tree-merged, zero shuffles,
    one edges pass; degree-0 nodes included)."""
    from incubator_sedona_ray.graph.degrees import degree_histogram

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_edges_fn(n), batch_format="pyarrow")
    return degree_histogram(edges, n, direction="in")


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink round-trip — THE LLM corpus interchange format:
    write the documents table as JSON-lines (Ray native write_json, one
    file per block, /tmp cache guarded by a _SUCCESS marker + atomic dir
    promotion), read it back file-parallel with read_json, return the
    reconstructed rows — byte-identical to the source table."""
    import hashlib
    import shutil

    tag = hashlib.sha256(("jsonl|" + sf_dir).encode()).hexdigest()[:12]
    path = f"/tmp/isr_jsonl_{tag}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp_dir = f"{path}.tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        _docs(sf_dir, columns=["doc_id", "text", "lang"]).write_json(tmp_dir)
        with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp_dir, path)
        except OSError:
            shutil.rmtree(tmp_dir, ignore_errors=True)  # lost a concurrent race
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".json")
    )
    return ray.data.read_json(files).select_columns(["doc_id", "text", "lang"])


WIN_LEN, WIN_STRIDE = 64, 48


def q_sliding_chunks(sf_dir: str):
    """Overlapping RAG passage windows (text/packing.py sliding_chunks):
    window k = tokens [k*48, k*48+64), last window = first to reach the
    doc end — one vectorized stateless map, zero shuffles."""
    from incubator_sedona_ray.text.packing import sliding_chunks

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return sliding_chunks(docs, WIN_LEN, WIN_STRIDE)


def q_compression_ratio(sf_dir: str):
    """Gopher-style compressibility signal (text/analysis.py
    compression_ratio_fn): zlib-deflate ratio per document — boilerplate
    compresses far below prose. Streaming map; golden-fixture oracle
    (no SQL engine exposes deflate)."""
    from incubator_sedona_ray.text.analysis import compression_ratio_fn

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(compression_ratio_fn(), batch_format="pyarrow").select_columns(
        ["doc_id", "comp_ratio"]
    )


def q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank (Haveliwala 2002; graph/pagerank.py
    seeds=...): teleport mass restricted to the doc_id%97==0 seed set —
    same exact int64 fixed-point recurrence, seeds hold the restart mass
    and collect the dangling redistribution. Bit-equal to the unrolled
    SQL oracle."""
    from incubator_sedona_ray.graph.pagerank import pagerank

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_edges_fn(n), batch_format="pyarrow")
    nodes = _rename(docs, {"doc_id": "node"})

    def seed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids[ids % 97 == 0], type=pa.int64())})

    seeds = docs.map_batches(seed, batch_format="pyarrow")
    out = pagerank(
        edges, nodes, iters=PAGERANK_ITERS, scale=PAGERANK_SCALE, n_nodes=n, seeds=seeds
    )
    return _rename(out, {"node": "doc_id"})


MIX_SEED = 11


def q_mixture_sample(sf_dir: str):
    """Training-mixture rebalancing (dedup/sample.py mixture_rates +
    sample_stratified): keep rates that give every language an EQUAL token
    share of a 1/4-of-corpus budget — rates from one tiny token-total
    groupby, then the deterministic fmix32 hash filter. Two streaming
    passes, zero corpus shuffles; bit-replayable in SQL."""
    from incubator_sedona_ray.dedup.sample import mixture_rates, sample_stratified
    from incubator_sedona_ray.text.packing import count_tokens_batch

    counted = (
        _docs(sf_dir, columns=["doc_id", "lang", "text"])
        .map_batches(count_tokens_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "lang", "n_tokens"])
    )
    rates = mixture_rates(counted, strata_col="lang", tokens_col="n_tokens")
    out = sample_stratified(counted, rates, strata_col="lang", seed=MIX_SEED)
    return out.select_columns(["doc_id", "lang"])


BFS_MAX_HOPS = 6


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance (graph/bfs.py) from seed docs
    (doc_id%97==0) over the pagerank query's synthetic link graph: one
    frontier-x-edges hash join + one node-keyed groupby-min per hop, early
    stop on an empty frontier. Oracle: recursive-CTE shortest path."""
    from incubator_sedona_ray.graph.bfs import hop_distance

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_edges_fn(n), batch_format="pyarrow")

    def seed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids[ids % 97 == 0], type=pa.int64())})

    seeds = docs.map_batches(seed, batch_format="pyarrow")
    out = hop_distance(edges, seeds, max_hops=BFS_MAX_HOPS, n_nodes=n)
    return _rename(out, {"node": "doc_id"})


def q_warc_roundtrip(sf_dir: str):
    """WARC source end-to-end (sources/warc.py): synthesize pages, write a
    gzipped WARC/1.0 archive (one file per block, content-hashed names,
    _SUCCESS-guarded /tmp cache with atomic directory promotion), read it
    back file-parallel, and re-extract the text from each record's html
    payload — output must match the documents table byte-for-byte."""
    import hashlib
    import shutil

    from incubator_sedona_ray.pipelines.pages import synth_pages_fn
    from incubator_sedona_ray.sources.warc import read_warc, write_warc
    from incubator_sedona_ray.text.extract import extract_text

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": b["url"],
                # cast to second precision first: Arrow's %S prints the
                # fractional part for sub-second timestamp units
                "warc_date": pc.strftime(
                    b["warc_ts"].cast(pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%SZ"
                ),
                "payload": b["html"],
            }
        )

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/isr_warc_{tag}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages = (
            _docs(sf_dir, columns=["doc_id", "text", "lang", "source"])
            .map_batches(synth_pages_fn, batch_format="pyarrow")
            .map_batches(prep, batch_format="pyarrow")
            .repartition(8)
        )
        tmp_dir = f"{path}.tmp.{os.getpid()}"
        write_warc(pages, tmp_dir, compress=True)
        try:
            os.rename(tmp_dir, path)
        except OSError:
            shutil.rmtree(tmp_dir, ignore_errors=True)  # lost a concurrent race

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".warc.gz")
    )
    recs = _rename(read_warc(files), {"payload": "html"})
    out = extract_text(recs, html_col="html", out_col="text")
    return out.select_columns(["url", "warc_date", "text"])


PACK_CAPACITY = 512


def q_pack_offsets(sf_dir: str):
    """GPT-style cross-document sequence packing (text/packing.py
    pack_offsets): concat the corpus in doc_id order, cut every 512 tokens
    — each doc's global token offset comes from a distributed exclusive
    prefix sum (state/scan.py range partitioning + per-range local scan,
    one real shuffle), the SQL window-function equivalent."""
    from incubator_sedona_ray.text.packing import pack_offsets

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return pack_offsets(docs, PACK_CAPACITY)


PAGERANK_ITERS = 5
PAGERANK_SCALE = 10**12
HITS_ITERS = 3
HITS_SCALE = 10**9


def _synth_edges_fn(n_docs: int):
    """Deterministic 3-out-regular link graph over doc ids, with every
    doc_id%11==0 node made DANGLING (no out-edges) to exercise the
    dangling-mass redistribution."""

    def fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids[ids % 11 != 0]
        src = np.repeat(keep, 3)
        j = np.tile(np.array([1, 2, 3], dtype=np.int64), len(keep))
        dst = (src * 7 + j * 13) % n_docs
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    return fn


def q_pagerank(sf_dir: str):
    """Distributed PageRank (graph/pagerank.py), 5 damped rounds over the
    synthetic 3-out-regular doc graph in EXACT int64 fixed-point (picorank
    scale 1e12): each round is one edges-x-ranks hash join + one
    node-keyed groupby, with the dangling mass (doc_id%11==0 nodes)
    redistributed uniformly — bit-equal to the unrolled SQL oracle."""
    from incubator_sedona_ray.graph.pagerank import pagerank

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_edges_fn(n), batch_format="pyarrow")
    nodes = _rename(docs, {"doc_id": "node"})
    out = pagerank(
        edges, nodes, iters=PAGERANK_ITERS, scale=PAGERANK_SCALE, n_nodes=n
    )
    return _rename(out, {"node": "doc_id"})


def q_hits(sf_dir: str):
    """Distributed HITS hubs-and-authorities (Kleinberg 1999;
    graph/hits.py), 3 full rounds over the synthetic 3-out-regular doc
    graph in EXACT int64 fixed-point (nanoscore scale 1e9): each
    half-round is one edge pass + an integer floor-renormalization
    (a = a_raw // max(sum(a_raw) // scale, 1)) — bit-equal to the
    unrolled SQL oracle in BOTH dense and BSP modes."""
    from incubator_sedona_ray.graph.hits import hits

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_edges_fn(n), batch_format="pyarrow")
    nodes = _rename(docs, {"doc_id": "node"})
    out = hits(edges, nodes, iters=HITS_ITERS, scale=HITS_SCALE, n_nodes=n)
    return _rename(out, {"node": "doc_id"})


def q_html_extract(sf_dir: str):
    """North-star invariant as an operator: synthesize the page table
    (url, warc_ts, html, text, lang), re-extract text from the raw html
    bytes with the vectorized RE2 chain (text/extract.py strip mode), and
    emit the byte-identity verdict per url — extraction must recover the
    reference text exactly through head/title/style/script/comment chrome."""
    from incubator_sedona_ray.pipelines.pages import synth_pages_fn
    from incubator_sedona_ray.text.extract import extract_text

    pages = _docs(sf_dir, columns=["doc_id", "text", "lang", "source"]).map_batches(
        synth_pages_fn, batch_format="pyarrow"
    )
    out = extract_text(pages, html_col="html", out_col="extracted_text")

    def verdict(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.append_column("matches", pc.equal(b["extracted_text"], b["text"]))

    return out.map_batches(verdict, batch_format="pyarrow").select_columns(
        ["url", "extracted_text", "matches"]
    )


SAMPLE_RATES = {"en": 0.5, "zh": 0.2, "es": 0.1, "de": 0.3, "fr": 0.25}
SAMPLE_DEFAULT = 0.05
SAMPLE_SEED = 7


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language corpus rebalancing (dedup/sample.py):
    keep iff fmix32(doc_id + seed)/2^32 < rate[lang] — a stateless
    vectorized filter with zero shuffles, bit-replayable in SQL (the
    oracle runs the identical MurmurHash3 finalizer via HUGEINT ops)."""
    from incubator_sedona_ray.dedup.sample import sample_stratified

    ds = _docs(sf_dir, columns=["doc_id", "lang"])
    out = sample_stratified(
        ds, SAMPLE_RATES, strata_col="lang", seed=SAMPLE_SEED, default_rate=SAMPLE_DEFAULT
    )
    return out.select_columns(["doc_id", "lang"])


def q_dedup_incremental(sf_dir: str):
    """Recrawl dedup against a prior snapshot (dedup/exact.py
    dedup_incremental): the 'seen' set is the sha256 manifest of docs with
    doc_id % 3 == 0; the full corpus streams through a broadcast
    searchsorted membership filter — zero shuffles (join mode covers
    unbounded seen sets)."""
    from incubator_sedona_ray.dedup.exact import add_text_hash_fn, dedup_incremental

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def seen_filter(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    seen = docs.map_batches(seen_filter, batch_format="pyarrow").map_batches(
        add_text_hash_fn(), batch_format="pyarrow"
    )
    out = dedup_incremental(docs, seen, mode="broadcast")
    return out.select_columns(["doc_id", "text_hash"])


RESERVOIR_K = 64
RESERVOIR_SEED = 5


def q_reservoir_sample(sf_dir: str):
    """Exact-size deterministic uniform sample (dedup/sample.py
    sample_fixed_k): fmix32 hash-key reservoir, local top-k per batch +
    one single-group merge — zero shuffles. Bit-replayable in SQL
    (ORDER BY fmix32(id), id LIMIT k)."""
    from incubator_sedona_ray.dedup import sample_fixed_k

    docs = _docs(sf_dir, columns=["doc_id", "lang"])
    return sample_fixed_k(docs, RESERVOIR_K, seed=RESERVOIR_SEED).select_columns(
        ["doc_id", "lang"]
    )


def q_reservoir_per_lang(sf_dir: str):
    """Exactly k rows per language (sample_fixed_k_per_group): per-batch
    per-group top-k partials, keyed shuffle bounded by batches x groups x k."""
    from incubator_sedona_ray.dedup import sample_fixed_k_per_group

    docs = _docs(sf_dir, columns=["doc_id", "lang"])
    return sample_fixed_k_per_group(docs, 10, seed=RESERVOIR_SEED).select_columns(
        ["doc_id", "lang"]
    )


QUANTILE_QS = (0.25, 0.5, 0.9, 0.99)


def q_doclen_quantiles(sf_dir: str):
    """EXACT global quantiles of document length WITHOUT a global sort
    (sketch/quantiles.py): 3 streaming histogram passes, shuffle bounded by
    bucket count — vs `ds.sort()` which moves every row. Matches DuckDB
    quantile_disc semantics (1-based rank ceil(q*n))."""
    from incubator_sedona_ray.sketch import quantiles_exact

    docs = _docs(sf_dir, columns=["n_chars"])
    got = quantiles_exact(docs, "n_chars", list(QUANTILE_QS))
    return pa.table(
        {
            "q": pa.array(list(QUANTILE_QS), pa.float64()),
            "value": pa.array([float(got[q]) for q in QUANTILE_QS], pa.float64()),
        }
    )


def q_lang_length_quantiles(sf_dir: str):
    """Per-language exact median/p90 of document length via (group, value)
    count partials — the shuffle carries distinct (lang, length) pairs, not
    rows (sketch/quantiles.py grouped_quantiles_exact)."""
    from incubator_sedona_ray.sketch import grouped_quantiles_exact

    docs = _docs(sf_dir, columns=["lang", "n_chars"])
    out = grouped_quantiles_exact(docs, "n_chars", [0.5, 0.9], by="lang")
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("value"), "value", b["value"].cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


POSTINGS_TERMS = ("hash", "merge", "window")


def q_postings_lookup(sf_dir: str):
    """Inverted-index build + bucket-pruned term lookup (text/index.py):
    the corpus is written once as hive-partitioned (token,doc,tf) postings
    bucketed by token hash; a term query then reads ONLY its terms' bucket
    directories (asserted: scanned < total) — the IVF-style IO-pruning
    layout applied to text retrieval."""
    import tempfile

    from incubator_sedona_ray.text.index import build_inverted_index, term_postings

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    path = tempfile.mkdtemp(prefix="postings_", dir="/tmp")
    build_inverted_index(docs, path, n_buckets=64)
    out, scanned, total = term_postings(path, list(POSTINGS_TERMS))
    assert scanned < total, (scanned, total)  # the pruning IS the point
    return out


COLLOC_K, COLLOC_MIN = 20, 5


def q_collocations(sf_dir: str):
    """Top-k collocations by lift (text/ngrams.py top_collocations): exact
    unigram + bigram distinct-key counts, lift from integer counts in one
    fixed float64 expression (PMI without the libm log), mergeable top-k."""
    from incubator_sedona_ray.text.ngrams import top_collocations

    docs = _docs(sf_dir, columns=["text"])
    return top_collocations(docs, k=COLLOC_K, min_count=COLLOC_MIN)


def q_collocations_join(sf_dir: str):
    """Same collocations, FORCED join path: the min_count-surviving bigram
    table hash-joins the distributed unigram table twice (no driver
    unigram broadcast anywhere) — the 100 TB shape for vocabularies too
    large to ship (text/ngrams.py mode='join')."""
    from incubator_sedona_ray.text.ngrams import top_collocations

    docs = _docs(sf_dir, columns=["text"])
    return top_collocations(docs, k=COLLOC_K, min_count=COLLOC_MIN, mode="join")


TPCH_Q14_LO, TPCH_Q14_HI = "1996-03-01", "1996-04-01"


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14-style promo-revenue ratio: a pure mergeable reduction —
    part broadcasts as a sorted partkey->is_promo lookup, each lineitem
    batch emits ONE (promo_cents, total_cents) int64 partial row, and the
    ratio finalizes from the two exact integer sums with a single float64
    expression. Zero shuffles, O(batches) exchanged."""
    lo, hi = np.datetime64(TPCH_Q14_LO), np.datetime64(TPCH_Q14_HI)
    part = (
        ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    lut = ray.put(
        {
            "pk": part["p_partkey"].to_numpy(),
            "promo": part["p_type"].str.startswith("PROMO").to_numpy(),
        }
    )

    def partial(b: pa.Table, lut) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        keys = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(lut["pk"], keys), 0, max(len(lut["pk"]) - 1, 0))
        promo = (lut["pk"][idx] == keys) & lut["promo"][idx]
        return pa.table(
            {
                "promo_c": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_c": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    parts = broadcast_map_batches(li, partial, {"lut": lut}).to_pandas()
    promo_c, total_c = int(parts["promo_c"].sum()), int(parts["total_c"].sum())
    ratio = 100.0 * np.float64(promo_c) / np.float64(total_c)
    return pa.table(
        {
            "promo_cents2": pa.array([promo_c], pa.int64()),
            "total_cents2": pa.array([total_c], pa.int64()),
            "promo_revenue_pct": pa.array([ratio], pa.float64()),
        }
    )


def q_script_mix(sf_dir: str):
    """Unicode-script composition per doc (text/analysis.py script_mix_fn):
    one vectorized RE2 \\p{Script} count kernel per script per batch;
    stateless map, zero shuffles."""
    from incubator_sedona_ray.text.analysis import script_mix_fn

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    out = docs.map_batches(script_mix_fn(), batch_format="pyarrow")
    return out.drop_columns(["text"])


def q_lang_moments(sf_dir: str):
    """Per-language mean/variance of doc length via EXACT integer moment
    partials (sketch/moments.py): float sums are order-dependent, so the
    distributed aggregation carries (n, sum, sum^2) as int64 and finalizes
    with one fixed float64 expression — bit-identical to the oracle, which
    derives mean/var from the same integer sums rather than its own AVG."""
    from incubator_sedona_ray.sketch import grouped_moments

    docs = _docs(sf_dir, columns=["lang", "n_chars"])
    return grouped_moments(docs, "n_chars", by="lang")


def q_lang_distinct_sources(sf_dir: str):
    """Exact COUNT(DISTINCT source) per language: per-batch distinct
    (lang, source) pairs (map-side combine), keyed groupby over the pair
    stream, then a per-lang count — the shuffle carries distinct pairs,
    not rows."""
    docs = _docs(sf_dir, columns=["lang", "source"])

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b["lang"], "source": b["source"]})
        return t.group_by(["lang", "source"]).aggregate([])

    distinct = docs.map_batches(pairs, batch_format="pyarrow").groupby(["lang", "source"]).count()
    out = distinct.groupby("lang").count()
    return out.map_batches(
        lambda b: b.rename_columns(["lang", "n_sources"]).set_column(
            1, "n_sources", b.column(1).cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


BAND_LO_Q, BAND_HI_Q = 0.05, 0.95


def q_length_band_filter(sf_dir: str):
    """Quantile-band corpus filter (Gopher-style length trimming with
    DATA-DERIVED thresholds): phase 1 computes exact global p05/p95 via the
    sortless histogram quantiles, phase 2 streams the corpus through the
    [p05, p95] band filter — the composition pattern for any
    'filter by percentile' pipeline stage."""
    from incubator_sedona_ray.sketch import quantiles_exact

    got = quantiles_exact(_docs(sf_dir, columns=["n_chars"]), "n_chars", [BAND_LO_Q, BAND_HI_Q])
    lo, hi = got[BAND_LO_Q], got[BAND_HI_Q]

    def band(b: pa.Table) -> pa.Table:
        v = b["n_chars"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((v >= lo) & (v <= hi)))

    return _docs(sf_dir, columns=["doc_id", "n_chars"]).map_batches(band, batch_format="pyarrow")


TOP_NGRAM_K = 20


def q_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 word bigrams, exact (text/ngrams.py): per-batch
    np.unique partial counts -> distinct-ngram groupby sum -> mergeable
    local/global top-k. Ties (count desc, ngram asc)."""
    from incubator_sedona_ray.text.ngrams import top_ngrams

    docs = _docs(sf_dir, columns=["text"])
    return top_ngrams(docs, n=2, k=TOP_NGRAM_K)


HLL_P = 12
HLL_DOMAIN_MOD = 10_007


def q_hll_domains(sf_dir: str):
    """HyperLogLog distinct-domain estimate (sketch/hll.py): ONE register
    row per batch, block-level max-merge, O(#blocks) driver fold — the
    100 TB replacement for a COUNT(DISTINCT) shuffle. sha256-hashed ->
    bit-deterministic -> golden-fixture oracle; the pytest suite asserts
    the estimate against the exact count within the 1.04/sqrt(2^p) bound."""
    from incubator_sedona_ray.sketch import hll_count_distinct

    docs = _docs(sf_dir, columns=["doc_id"])

    def mk_dom(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        doms = np.char.add(
            np.char.add("dom", (ids % HLL_DOMAIN_MOD).astype("U8")), ".net"
        )
        return pa.table({"domain": pa.array(doms.astype(object), pa.string())})

    est = hll_count_distinct(docs.map_batches(mk_dom, batch_format="pyarrow"), "domain", p=HLL_P)
    return pa.table({"p": pa.array([HLL_P], pa.int64()), "estimate": pa.array([round(est, 6)], pa.float64())})


TPCH_Q5_REGION = "ASIA"
TPCH_Q5_LO, TPCH_Q5_HI = "1996-01-01", "1997-01-01"


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5-style local-supplier revenue: ONE big-big hash join
    (lineitem x date-filtered orders on orderkey); every dimension hop —
    region->nation set, custkey->nationkey, suppkey->nationkey — is a
    broadcast sorted-key lookup, and revenue rolls up in exact integer
    cents with map-side partials. At true TPC-H ratios customer is ~1.5%
    of lineitem: broadcastable far longer than orders, and the fallback is
    the same size-adaptive equi_join_auto used for the orderkey join."""
    from incubator_sedona_ray.state.blocks import equi_join_auto

    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region = ray.data.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    nk = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nk = nk[nk.r_name == TPCH_Q5_REGION][["n_nationkey", "n_name"]].sort_values("n_nationkey")
    nation_keys = nk["n_nationkey"].to_numpy()
    nation_names = nk["n_name"].to_numpy()

    cust = (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        .to_pandas()
        .sort_values("c_custkey")
    )
    supp = (
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    lut = ray.put(
        {
            "ck": cust["c_custkey"].to_numpy(),
            "cn": cust["c_nationkey"].to_numpy(),
            "sk": supp["s_suppkey"].to_numpy(),
            "sn": supp["s_nationkey"].to_numpy(),
            "nk": nation_keys,
        }
    )
    lo, hi = np.datetime64(TPCH_Q5_LO), np.datetime64(TPCH_Q5_HI)

    def orders_side(b: pa.Table, lut) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(lut["ck"], keys), 0, len(lut["ck"]) - 1)
        cnat = np.where(lut["ck"][idx] == keys, lut["cn"][idx], -1)
        keep = np.isin(cnat, lut["nk"])
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].filter(pa.array(keep)),
                "c_nat": pa.array(cnat[keep], pa.int32()),
            }
        )

    def li_side(b: pa.Table, lut) -> pa.Table:
        price_c = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_pct = _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(lut["sk"], keys), 0, len(lut["sk"]) - 1)
        snat = np.where(lut["sk"][idx] == keys, lut["sn"][idx], -1)
        keep = np.isin(snat, lut["nk"])
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"].filter(pa.array(keep)),
                "s_nat": pa.array(snat[keep], pa.int32()),
                "rev": pa.array((price_c * (100 - disc_pct))[keep], pa.int64()),
            }
        )

    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    ords = broadcast_map_batches(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        orders_side,
        {"lut": lut},
    )
    li = broadcast_map_batches(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        li_side,
        {"lut": lut},
    )
    from incubator_sedona_ray.dedup.minhash import _default_join_partitions

    joined = equi_join_auto(
        li, ords, "inner", on=("l_orderkey",), right_on=("o_orderkey",),
        # CPU-scaled: each hash-join partition is an aggregator ACTOR; a
        # fixed 32 stalls a 4-CPU session (32 actors, no CPU for tasks)
        num_partitions=_default_join_partitions() * 2,
    )

    name_by_key = ray.put({"keys": nation_keys, "names": nation_names})

    def rollup(b: pa.Table, nb) -> pa.Table:
        sn = b["s_nat"].to_numpy(zero_copy_only=False)
        keep = sn == b["c_nat"].to_numpy(zero_copy_only=False)  # local supplier
        sn = sn[keep]
        rev = b["rev"].to_numpy(zero_copy_only=False)[keep]
        idx = np.searchsorted(nb["keys"], sn)
        names = nb["names"][idx]
        t = pa.table({"n_name": pa.array(names, pa.string()), "rev": pa.array(rev, pa.int64())})
        return (
            t.group_by("n_name").aggregate([("rev", "sum")]).rename_columns(["n_name", "rev"])
        )

    parts = broadcast_map_batches(joined, rollup, {"nb": name_by_key})
    out = parts.groupby("n_name").sum("rev")
    return out.map_batches(
        lambda b: b.rename_columns(["n_name", "revenue_cents2"]), batch_format="pyarrow"
    )


TOPDOCS_K = 5


def q_top_docs_per_lang(sf_dir: str):
    """Grouped top-k as a mergeable reduction: per batch keep each lang's
    local top-k by (alpha_ratio desc, doc_id asc) — top-k merges exactly,
    so only k rows per (lang, batch) shuffle; a per-group finalize ranks.
    alpha_ratio is bit-deterministic vs SQL (exact int/int division)."""
    from incubator_sedona_ray.text.analysis import quality_fn

    qfn = quality_fn()

    def local(b: pa.Table) -> pa.Table:
        b = qfn(b)
        df = pa.table(
            {"lang": b["lang"], "doc_id": b["doc_id"], "alpha_ratio": b["alpha_ratio"]}
        ).to_pandas()
        df = df.sort_values(["alpha_ratio", "doc_id"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("lang", sort=False).head(TOPDOCS_K), preserve_index=False)

    cand = _docs(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
        local, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["alpha_ratio", "doc_id"], ascending=[False, True], kind="mergesort").head(
            TOPDOCS_K
        ).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby("lang").map_groups(merge, batch_format="pandas")


def q_image_dedup(sf_dir: str):
    """Perceptual image dedup (dedup/phash.py): every 5 consecutive doc_ids
    share a base image — v0 the base, v1/v2 near-identical variants (one-
    pixel bump / exact re-encode), v3 inverted and v4 re-gradiented (far).
    dHash (real PNG decode -> luma -> bilinear 8x9 -> difference bits) +
    the shared banded-hamming tail groups the near-identicals; ~3% of
    payloads are truncated to exercise skip-invalid (null hash, kept in the
    survivors universe). Golden-fixture oracle (no SQL closed form)."""
    from incubator_sedona_ray.dedup.phash import dhash_dedup
    from incubator_sedona_ray.raster.viz import png_encode_rgb

    docs = _docs(sf_dir, columns=["doc_id"])

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        from incubator_sedona_ray.dedup.sample import fmix32

        for i in ids:
            base, v = int(i) // 5, int(i) % 5
            w, h = 16 + base % 9, 12 + base % 5
            # hash-noise texture (NOT a smooth gradient — monotonic rows
            # would degenerate every dHash to the same all-ones pattern)
            px = fmix32(np.arange(h * w * 3, dtype=np.uint64) + np.uint64(base * 7919))
            img = (px % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)
            if v == 1:  # near-dup: bump one small corner region
                img = img.copy()
                img[:2, :2] = np.clip(img[:2, :2].astype(np.int64) + 24, 0, 255).astype(np.uint8)
            elif v == 3:
                img = (255 - img).copy()  # inversion flips every diff bit
            elif v == 4:
                img = np.rot90(img).copy()  # rearranged texture
            blob = png_encode_rgb(np.ascontiguousarray(img))
            if int(i) % 31 == 0:
                blob = blob[: len(blob) // 2]  # skip-invalid path
            payloads.append(blob)
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, type=pa.binary())}
        )

    pays = docs.map_batches(to_payload, batch_format="pyarrow")
    survivors, pairs = dhash_dedup(pays, max_hamming=3)
    return survivors.select_columns(["doc_id"])


TPCH_CUTOFF = "1998-09-01"


def _cents(x: np.ndarray) -> np.ndarray:
    """Exact cent-integer conversion identical to the SQL replica's
    ``CAST(floor(x*100 + 0.5) AS BIGINT)`` — integer sums are then
    order-independent, so the distributed aggregation can never diverge
    from DuckDB by float-summation order."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def q_tpch_q1(sf_dir: str):
    """TPC-H Q1-style pricing summary over the biggest table: filter at the
    read, map-side partial aggregation per batch (one Arrow group_by), then
    a tiny global groupby-sum over (returnflag, linestatus) partials. All
    money math in exact integer cents."""
    cutoff = np.datetime64(TPCH_CUTOFF)

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ship <= cutoff))
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_pct = _cents(b["l_discount"].to_numpy(zero_copy_only=False))  # 0..10
        rev = price_c * (100 - disc_pct)  # cents x pct: scale 10^4, exact
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pa.array(qty),
                "base_c": pa.array(price_c),
                "disc_c2": pa.array(rev),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_c", "sum"), ("disc_c2", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "qty", "base_c", "disc_c2", "n"])

    parts = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    ).map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby(["l_returnflag", "l_linestatus"]).sum(["qty", "base_c", "disc_c2", "n"])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b["sum(n)"], pa.int64())
        qty = pc.cast(b["sum(qty)"], pa.int64())
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": qty,
                "sum_base_cents": pc.cast(b["sum(base_c)"], pa.int64()),
                "sum_disc_cents2": pc.cast(b["sum(disc_c2)"], pa.int64()),
                "count_order": n,
                "avg_qty": pc.divide(pc.cast(qty, pa.float64()), pc.cast(n, pa.float64())),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


TPCH_Q6_LO = "1996-01-01"
TPCH_Q6_HI = "1997-01-01"


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6-style forecasting-revenue filter-aggregate: the purest
    scan shape — filter at the read columns, vectorized predicate, ONE
    int64 partial per batch, one global sum. Revenue in exact
    cents x discount-pct (scale 10^4) so the single output value is
    bit-equal to the SQL replica. Zero shuffles."""
    lo, hi = np.datetime64(TPCH_Q6_LO), np.datetime64(TPCH_Q6_HI)

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = _cents(b["l_discount"].to_numpy(zero_copy_only=False))  # 0..10
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        m = (d >= lo) & (d < hi) & (disc >= 5) & (disc <= 7) & (qty < 24)
        price_c = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)[m])
        rev = int((price_c * disc[m]).sum())
        return pa.table({"rev_cents2": pa.array([rev], pa.int64())})

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    total = li.map_batches(partial, batch_format="pyarrow").sum("rev_cents2") or 0
    return pa.table({"revenue_cents2": pa.array([int(total)], pa.int64())})


TPCH_Q4_LO = "1996-01-01"
TPCH_Q4_HI = "1996-07-01"


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4-style order-priority check, adapted to the synthetic
    schema (no commit/receipt dates): count orders per priority in a
    half-year window having AT LEAST ONE returned line (l_returnflag =
    'R') — the EXISTS shape as a distributed LEFT SEMI hash join (no
    dedup pass needed: semi join IS exists), then a tiny groupby count."""
    from incubator_sedona_ray.state.blocks import equi_join_auto

    lo, hi = np.datetime64(TPCH_Q4_LO), np.datetime64(TPCH_Q4_HI)

    def ofilter(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((d >= lo) & (d < hi)))

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(ofilter, batch_format="pyarrow")

    returned = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_returnflag"],
        )
        .map_batches(
            lambda b: b.filter(pc.equal(b["l_returnflag"], "R")).select(["l_orderkey"]),
            batch_format="pyarrow",
        )
    )
    hit = equi_join_auto(
        orders, returned, "left_semi", 8, on=("o_orderkey",), right_on=("l_orderkey",)
    )
    agg = hit.groupby("o_orderpriority").count()
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "order_count": pc.cast(b["count()"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


TPCH_Q10_LO = "1996-01-01"
TPCH_Q10_HI = "1996-04-01"
TPCH_Q10_K = 20


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10-style returned-item revenue report: revenue of RETURNED
    lines (l_returnflag='R') per customer for orders in a quarter, top 20
    by revenue. Shape: lineitem pre-aggregated per orderkey INSIDE each
    batch (map-side combine before the join), hash join against the
    filtered orders, per-customer cents rollup, deterministic top-k
    (revenue desc, custkey asc) with customer names re-attached via a
    broadcast lookup — the small side never shuffles."""
    from incubator_sedona_ray.state.blocks import equi_join_auto

    lo, hi = np.datetime64(TPCH_Q10_LO), np.datetime64(TPCH_Q10_HI)

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": pa.array(rev, pa.int64())})
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")

    def ofilter(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((d >= lo) & (d < hi))).select(["o_orderkey", "o_custkey"])

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_custkey"],
    ).map_batches(ofilter, batch_format="pyarrow")

    j = equi_join_auto(li, orders, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = j.groupby("o_custkey").sum("rev")

    cust = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
        )
        .to_pandas()
        .sort_values("c_custkey")
    )

    def topk(df):
        df = df.sort_values(["sum(rev)", "o_custkey"], ascending=[False, True]).head(
            TPCH_Q10_K
        )
        idx = np.searchsorted(cust["c_custkey"].to_numpy(), df["o_custkey"].to_numpy())
        import pandas as pd

        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype(np.int64).to_numpy(),
                "c_name": cust["c_name"].to_numpy()[idx],
                "revenue_cents2": df["sum(rev)"].astype(np.int64).to_numpy(),
            }
        )

    return (
        per_cust.add_column("_g", lambda b: __import__("pandas").Series(np.zeros(len(b), dtype=np.int64)))
        .groupby("_g")
        .map_groups(topk, batch_format="pandas")
    )


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3-style revenue rollup: lineitem (filtered at the read,
    pre-aggregated per orderkey inside each batch) hash-joins orders on the
    order key, the small customer side broadcasts as a custkey->segment
    lookup (no second shuffle), and revenue rolls up by (mktsegment,
    o_orderpriority) in exact integer cents."""
    from incubator_sedona_ray.state.blocks import equi_join_auto

    cutoff = np.datetime64(TPCH_CUTOFF)

    def li_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ship > cutoff))
        price_c = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_pct = _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {"l_orderkey": b["l_orderkey"], "rev": pa.array(price_c * (100 - disc_pct))}
        )
        return (
            t.group_by("l_orderkey").aggregate([("rev", "sum")]).rename_columns(["l_orderkey", "rev"])
        )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    from incubator_sedona_ray.dedup.minhash import _default_join_partitions

    joined = equi_join_auto(
        li, ords, "inner", on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=_default_join_partitions() * 2,  # actor-backed: CPU-scaled
        scrub_left=True, scrub_right=False,
    )

    # customer is the SMALL side: collect once, broadcast a sorted-key
    # lookup (searchsorted — no per-row dict lookups in the hot path)
    cust = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
        )
        .to_pandas()
        .sort_values("c_custkey")
    )
    seg_ref = ray.put(
        {"keys": cust["c_custkey"].to_numpy(), "segs": cust["c_mktsegment"].to_numpy()}
    )

    def add_seg(b: pa.Table, seg) -> pa.Table:
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(seg["keys"], keys)
        idx = np.clip(idx, 0, len(seg["keys"]) - 1)
        segs = np.where(seg["keys"][idx] == keys, seg["segs"][idx], None)
        t = b.append_column("c_mktsegment", pa.array(segs, type=pa.string()))
        g = (
            pa.table({"c_mktsegment": t["c_mktsegment"], "o_orderpriority": t["o_orderpriority"], "rev": t["rev"]})
            .group_by(["c_mktsegment", "o_orderpriority"])
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["c_mktsegment", "o_orderpriority", "rev"])

    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    parts = broadcast_map_batches(joined, add_seg, {"seg": seg_ref})
    agg = parts.groupby(["c_mktsegment", "o_orderpriority"]).sum("rev")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "o_orderpriority": b["o_orderpriority"],
                "revenue_cents2": pc.cast(b["sum(rev)"], pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H remainder (q2..q22), adapted to the synthetic schema: there is no
# partsupp table and no l_shipmode/commitdate/receiptdate/comment columns,
# so q2/q9/q11/q12/q16/q20/q21's partsupp- or date-triple-dependent
# predicates are substituted with equivalents over lineitem (each
# docstring states the substitution). Shapes and engine features exercised
# match the originals: left-outer (q13), correlated scalar subqueries
# (q11/q15/q17/q22), exists/not-exists self-joins (q21), OR-of-ANDs
# predicate pushdown (q19), min-join-back (q2), market-share rollups
# (q7/q8/q9). All money in exact integer cents (scale 10^2 or 10^4) so the
# distributed sums are bit-equal to DuckDB regardless of aggregation order.
# ---------------------------------------------------------------------------

TPCH_Q7_NATIONS = (1, 2)
TPCH_Q7_LO, TPCH_Q7_HI = "1995-01-01", "1997-01-01"
TPCH_Q8_TYPE = "ECONOMY"
TPCH_Q8_REGION = 2  # ASIA
TPCH_Q8_NATION = 2
TPCH_Q9_NAME_SUBSTR = "red"
TPCH_Q11_NATION = 3
TPCH_Q11_FRACTION_DEN = 500  # value > total/500
TPCH_Q13_EXCL_PRIORITY = "5-LOW"
TPCH_Q15_LO, TPCH_Q15_HI = "1996-01-01", "1996-04-01"
TPCH_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29, 33)
TPCH_Q17_BRAND, TPCH_Q17_MAX_SIZE = "Brand#7", 10
TPCH_Q18_MIN_QTY = 300
TPCH_Q20_LO, TPCH_Q20_HI = "1997-01-01", "1998-01-01"
TPCH_Q20_MIN_QTY = 40
TPCH_Q20_REGION = 3  # EUROPE
TPCH_Q21_LATE_DAYS = 90
TPCH_Q21_NATION = "NATION_4"
TPCH_Q22_CODES = (1, 3, 5, 7, 9, 11, 13)
TPCH_Q2_SIZE = 15
TPCH_Q2_REGION = 3  # EUROPE


def _tpch_read(sf_dir: str, table: str, cols: list[str]):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=cols)


def _tpch_jp() -> int:
    from incubator_sedona_ray.dedup.minhash import _default_join_partitions

    return _default_join_partitions() * 2


def _ss_gather(sorted_keys: np.ndarray, probe: np.ndarray):
    """(idx, hit) for probing a SORTED key array — the house broadcast-
    lookup primitive (no per-row dict lookups in hot paths)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=np.int64), np.zeros(len(probe), dtype=bool)
    idx = np.clip(np.searchsorted(sorted_keys, probe), 0, len(sorted_keys) - 1)
    return idx, sorted_keys[idx] == probe


def _year64(d: np.ndarray) -> np.ndarray:
    return d.astype("datetime64[Y]").astype(np.int64) + 1970


def _nation_names(sf_dir: str) -> np.ndarray:
    """n_name indexed by n_nationkey (contiguous 0..24)."""
    nat = (
        ray.data.read_parquet(os.path.join(sf_dir, "nation.parquet"))
        .to_pandas()
        .sort_values("n_nationkey")
    )
    return nat["n_name"].to_numpy()


def _supp_nat_lut(sf_dir: str) -> dict:
    supp = (
        _tpch_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    return {
        "sk": supp["s_suppkey"].to_numpy(),
        "sn": supp["s_nationkey"].to_numpy().astype(np.int64),
    }


def _cust_nat_lut(sf_dir: str) -> dict:
    cust = (
        _tpch_read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .to_pandas()
        .sort_values("c_custkey")
    )
    return {
        "ck": cust["c_custkey"].to_numpy(),
        "cn": cust["c_nationkey"].to_numpy().astype(np.int64),
    }


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 volume shipping between two nations: lineitem (date-pruned
    at the read, supplier-nation attached via broadcast sorted-key lookup)
    hash-joins orders (customer-nation attached the same way); the
    cross-pair filter and the (supp_nation, cust_nation, year) rollup are
    map-side partials in exact integer cents. One big-big exchange; the
    dimension hops never shuffle. Reference shape: TPC-H Q7 (no
    l_commitdate in the synthetic schema — Q7 does not need it)."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches
    from incubator_sedona_ray.state.blocks import equi_join_auto

    n1, n2 = TPCH_Q7_NATIONS
    lo, hi = np.datetime64(TPCH_Q7_LO), np.datetime64(TPCH_Q7_HI)
    slut = ray.put(_supp_nat_lut(sf_dir))
    clut = ray.put(_cust_nat_lut(sf_dir))
    names = _nation_names(sf_dir)

    def li_side(b: pa.Table, lut) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        idx, hit = _ss_gather(lut["sk"], keys)
        snat = np.where(hit, lut["sn"][idx], -1)
        keep = (snat == n1) | (snat == n2)
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        yr = _year64(b["l_shipdate"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"].filter(pa.array(keep)),
                "s_nat": pa.array(snat[keep], pa.int64()),
                "l_year": pa.array(yr[keep], pa.int64()),
                "rev": pa.array(rev[keep], pa.int64()),
            }
        )

    def o_side(b: pa.Table, lut) -> pa.Table:
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx, hit = _ss_gather(lut["ck"], keys)
        cnat = np.where(hit, lut["cn"][idx], -1)
        keep = (cnat == n1) | (cnat == n2)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].filter(pa.array(keep)),
                "c_nat": pa.array(cnat[keep], pa.int64()),
            }
        )

    li = broadcast_map_batches(
        _tpch_read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        li_side,
        {"lut": slut},
    )
    ords = broadcast_map_batches(
        _tpch_read(sf_dir, "orders", ["o_orderkey", "o_custkey"]), o_side, {"lut": clut}
    )
    j = equi_join_auto(
        li, ords, "inner", on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=_tpch_jp(),
    )

    def rollup(b: pa.Table) -> pa.Table:
        sn = b["s_nat"].to_numpy(zero_copy_only=False)
        cn = b["c_nat"].to_numpy(zero_copy_only=False)
        keep = ((sn == n1) & (cn == n2)) | ((sn == n2) & (cn == n1))
        t = pa.table(
            {
                "supp_nation": pa.array(names[sn[keep]], pa.string()),
                "cust_nation": pa.array(names[cn[keep]], pa.string()),
                "l_year": b["l_year"].filter(pa.array(keep)),
                "rev": b["rev"].filter(pa.array(keep)),
            }
        )
        return (
            t.group_by(["supp_nation", "cust_nation", "l_year"])
            .aggregate([("rev", "sum")])
            .rename_columns(["supp_nation", "cust_nation", "l_year", "rev"])
        )

    agg = (
        j.map_batches(rollup, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .sum("rev")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["supp_nation", "cust_nation", "l_year", "revenue_cents2"]),
        batch_format="pyarrow",
    )


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 national market share: lineitem pruned to one part type
    (broadcast partkey membership), supplier nation attached by broadcast;
    orders pruned to two years and customers whose nation sits in the
    target region (two more broadcast hops). After the single big-big
    orderkey join, the per-year rollup carries BOTH the target nation's
    revenue and the total as integer cents, so mkt_share is a ratio of two
    exact integers (bit-equal to SQL)."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches
    from incubator_sedona_ray.state.blocks import equi_join_auto

    lo, hi = np.datetime64(TPCH_Q7_LO), np.datetime64(TPCH_Q7_HI)
    part = _tpch_read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pkeys = np.sort(part.loc[part.p_type == TPCH_Q8_TYPE, "p_partkey"].to_numpy())
    slut = ray.put({**_supp_nat_lut(sf_dir), "pk": pkeys})
    nat = (
        ray.data.read_parquet(os.path.join(sf_dir, "nation.parquet"))
        .to_pandas()
        .sort_values("n_nationkey")
    )
    region_of = nat["n_regionkey"].to_numpy().astype(np.int64)  # indexed by nationkey
    clut = ray.put({**_cust_nat_lut(sf_dir), "rg": region_of})

    def li_side(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, hit = _ss_gather(lut["pk"], pk)
        b = b.filter(pa.array(hit))
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        idx, ok = _ss_gather(lut["sk"], keys)
        snat = np.where(ok, lut["sn"][idx], -1)
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "s_nat": pa.array(snat, pa.int64()),
                "rev": pa.array(rev, pa.int64()),
            }
        )

    def o_side(b: pa.Table, lut) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx, ok = _ss_gather(lut["ck"], keys)
        cnat = np.where(ok, lut["cn"][idx], -1)
        keep = ok & (lut["rg"][np.clip(cnat, 0, len(lut["rg"]) - 1)] == TPCH_Q8_REGION)
        yr = _year64(b["o_orderdate"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].filter(pa.array(keep)),
                "o_year": pa.array(yr[keep], pa.int64()),
            }
        )

    li = broadcast_map_batches(
        _tpch_read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        li_side,
        {"lut": slut},
    )
    ords = broadcast_map_batches(
        _tpch_read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        o_side,
        {"lut": clut},
    )
    j = equi_join_auto(
        li, ords, "inner", on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=_tpch_jp(),
    )

    def rollup(b: pa.Table) -> pa.Table:
        sn = b["s_nat"].to_numpy(zero_copy_only=False)
        rev = b["rev"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "o_year": b["o_year"],
                "nat_rev": pa.array(np.where(sn == TPCH_Q8_NATION, rev, 0), pa.int64()),
                "rev": b["rev"],
            }
        )
        return (
            t.group_by("o_year")
            .aggregate([("nat_rev", "sum"), ("rev", "sum")])
            .rename_columns(["o_year", "nat_rev", "rev"])
        )

    agg = (
        j.map_batches(rollup, batch_format="pyarrow")
        .groupby("o_year")
        .sum(["nat_rev", "rev"])
    )

    def fin(b: pa.Table) -> pa.Table:
        num = pc.cast(b["sum(nat_rev)"], pa.int64())
        den = pc.cast(b["sum(rev)"], pa.int64())
        share = np.asarray(num, dtype=np.float64) / np.asarray(den, dtype=np.float64)
        return pa.table(
            {
                "o_year": b["o_year"],
                "nation_cents2": num,
                "total_cents2": den,
                "mkt_share": pa.array(share, pa.float64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 product-type profit (adapted: no partsupp table, so profit
    is the discounted revenue without the supplycost term): lineitem pruned
    to parts whose name contains the substring (broadcast partkey set),
    supplier nation attached by broadcast, one orderkey hash join to fetch
    the order year, rollup by (nation, year) in integer cents."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches
    from incubator_sedona_ray.state.blocks import equi_join_auto

    part = _tpch_read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    pkeys = np.sort(
        part.loc[part.p_name.str.contains(TPCH_Q9_NAME_SUBSTR), "p_partkey"].to_numpy()
    )
    slut = ray.put({**_supp_nat_lut(sf_dir), "pk": pkeys})
    names = _nation_names(sf_dir)

    def li_side(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, hit = _ss_gather(lut["pk"], pk)
        b = b.filter(pa.array(hit))
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        idx, ok = _ss_gather(lut["sk"], keys)
        snat = np.where(ok, lut["sn"][idx], -1)
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "s_nat": pa.array(snat, pa.int64()),
                "rev": pa.array(rev, pa.int64()),
            }
        )

    def o_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_year": pa.array(
                    _year64(b["o_orderdate"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )

    li = broadcast_map_batches(
        _tpch_read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        li_side,
        {"lut": slut},
    )
    ords = _tpch_read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        o_side, batch_format="pyarrow"
    )
    j = equi_join_auto(
        li, ords, "inner", on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=_tpch_jp(),
    )

    def rollup(b: pa.Table) -> pa.Table:
        sn = b["s_nat"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "nation": pa.array(names[sn], pa.string()),
                "o_year": b["o_year"],
                "rev": b["rev"],
            }
        )
        return (
            t.group_by(["nation", "o_year"])
            .aggregate([("rev", "sum")])
            .rename_columns(["nation", "o_year", "rev"])
        )

    agg = (
        j.map_batches(rollup, batch_format="pyarrow").groupby(["nation", "o_year"]).sum("rev")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["nation", "o_year", "profit_cents2"]),
        batch_format="pyarrow",
    )


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 important parts (adapted: no partsupp, so a part's value
    is the summed extended price of its lineitems from the target nation's
    suppliers): lineitem pruned by a broadcast supplier set, map-side
    per-part partials, one part-bounded groupby, then the scalar-subquery
    HAVING is an exact INTEGER comparison value*DEN > total (no float
    fraction), with the total taken from the already-aggregated
    part-bounded table — the big table is scanned exactly once."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    supp = _supp_nat_lut(sf_dir)
    skeys = np.sort(supp["sk"][supp["sn"] == TPCH_Q11_NATION])
    sref = ray.put({"sk": skeys})

    def partial(b: pa.Table, lut) -> pa.Table:
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, hit = _ss_gather(lut["sk"], keys)
        b = b.filter(pa.array(hit))
        t = pa.table(
            {
                "p_partkey": b["l_partkey"],
                "value_cents": pa.array(
                    _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )
        return (
            t.group_by("p_partkey").aggregate([("value_cents", "sum")]).rename_columns(["p_partkey", "value_cents"])
        )

    per_part = (
        broadcast_map_batches(
            _tpch_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]),
            partial,
            {"lut": sref},
        )
        .groupby("p_partkey")
        .sum("value_cents")
        .materialize()  # part-bounded (≤ |part| rows) — tiny vs lineitem
    )
    total = int(per_part.sum("sum(value_cents)") or 0)

    def fin(b: pa.Table) -> pa.Table:
        v = pc.cast(b["sum(value_cents)"], pa.int64())
        keep = np.asarray(v, dtype=np.int64) * TPCH_Q11_FRACTION_DEN > total
        t = pa.table({"p_partkey": b["p_partkey"], "value_cents": v})
        return t.filter(pa.array(keep))

    return per_part.map_batches(fin, batch_format="pyarrow")


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shipping-delay priority check (adapted: the synthetic
    schema has no l_shipmode/commitdate/receiptdate, so lines are bucketed
    by order->ship delay instead of ship mode): one big-big orderkey hash
    join, then map-side partial counts of high/low priority lines per delay
    bucket — the global groupby sees 3 rows per batch."""
    from incubator_sedona_ray.state.blocks import equi_join_auto

    li = _tpch_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    ords = _tpch_read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = equi_join_auto(
        li, ords, "inner", on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=_tpch_jp(), scrub_left=False, scrub_right=False,
    )

    def rollup(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False)
        od = b["o_orderdate"].to_numpy(zero_copy_only=False)
        days = (ship - od).astype("timedelta64[D]").astype(np.int64)
        bucket = np.where(days > 90, "91+", np.where(days > 30, "31-90", "0-30"))
        pri = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = (pri == "1-URGENT") | (pri == "2-HIGH")
        t = pa.table(
            {
                "delay_bucket": pa.array(bucket, pa.string()),
                "high_line_count": pa.array(high.astype(np.int64)),
                "low_line_count": pa.array((~high).astype(np.int64)),
            }
        )
        return (
            t.group_by("delay_bucket")
            .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
            .rename_columns(["delay_bucket", "high_line_count", "low_line_count"])
        )

    agg = (
        j.map_batches(rollup, batch_format="pyarrow")
        .groupby("delay_bucket")
        .sum(["high_line_count", "low_line_count"])
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["delay_bucket", "high_line_count", "low_line_count"]),
        batch_format="pyarrow",
    )


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 customer order-count distribution: the LEFT OUTER
    customer x filtered-orders join is decomposed shuffle-free on the
    customer side — orders groupby custkey (FK contract: every o_custkey
    exists in customer, as in TPC-H), a second tiny groupby over the
    per-customer counts, and the zero-orders bin computed as
    |customer| - |distinct custkeys| from two streaming aggregates. No
    customer-table shuffle at all; the oracle states the same query as the
    literal LEFT OUTER JOIN."""
    ords = _tpch_read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["o_orderpriority"], TPCH_Q13_EXCL_PRIORITY))).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    per_cust = ords.groupby("o_custkey").count()  # (o_custkey, count())
    hist = (
        per_cust.map_batches(
            lambda b: pa.table({"c_count": pc.cast(b["count()"], pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("c_count")
        .count()
        .map_batches(
            lambda b: pa.table(
                {"c_count": b["c_count"], "custdist": pc.cast(b["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()  # ≤ max-orders-per-customer rows
    )
    n_cust = _tpch_read(sf_dir, "customer", ["c_custkey"]).count()
    n_with = int(hist.sum("custdist") or 0)
    zero_bin = n_cust - n_with
    if zero_bin > 0:
        hist = hist.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "c_count": pa.array([0], pa.int64()),
                        "custdist": pa.array([zero_bin], pa.int64()),
                    }
                )
            )
        )
    return hist


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 top supplier: quarter-pruned lineitem rolls up revenue per
    suppkey map-side (supplier-bounded groupby), the scalar MAX comes from
    a streaming aggregate over that small table, and the winner rows attach
    s_name via a broadcast lookup — the correlated `= (SELECT MAX(...))`
    shape with one scan of the big table and zero big shuffles."""
    lo, hi = np.datetime64(TPCH_Q15_LO), np.datetime64(TPCH_Q15_HI)

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        t = pa.table({"s_suppkey": b["l_suppkey"], "rev": pa.array(rev, pa.int64())})
        return t.group_by("s_suppkey").aggregate([("rev", "sum")]).rename_columns(["s_suppkey", "rev"])

    per_supp = (
        _tpch_read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("rev")
        .materialize()  # supplier-bounded
    )
    # `or 0` guards the empty date window (max of an empty Dataset is
    # None); per_supp is empty then, so the result stays empty like the
    # oracle's
    mx = int(per_supp.max("sum(rev)") or 0)
    supp = (
        _tpch_read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sk, sn = supp["s_suppkey"].to_numpy(), supp["s_name"].to_numpy()

    def fin(b: pa.Table) -> pa.Table:
        rev = np.asarray(pc.cast(b["sum(rev)"], pa.int64()), dtype=np.int64)
        b = b.filter(pa.array(rev == mx))
        keys = b["s_suppkey"].to_numpy(zero_copy_only=False)
        idx, _ = _ss_gather(sk, keys)
        return pa.table(
            {
                "s_suppkey": b["s_suppkey"],
                "s_name": pa.array(sn[idx], pa.string()),
                "total_revenue_cents2": pc.cast(b["sum(rev)"], pa.int64()),
            }
        )

    return per_supp.map_batches(fin, batch_format="pyarrow")


TPCH_Q16_EXCL_BRAND = "Brand#5"
TPCH_Q16_EXCL_TYPE = "PROMO"


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 supplier-part relationship (adapted: distinct
    (partkey,suppkey) pairs come from lineitem instead of partsupp, and
    the complaints filter becomes s_acctbal >= 0): part attributes and the
    good-supplier set ride as broadcast lookups; each batch emits locally
    deduped (brand,type,size,suppkey) rows, one groupby collapses global
    duplicates, a second counts distinct suppliers per attribute triple —
    COUNT(DISTINCT) as two bounded-cardinality shuffles, never a
    pairs-sized one."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    part = (
        _tpch_read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    pmask = (
        (part["p_brand"] != TPCH_Q16_EXCL_BRAND)
        & (part["p_type"] != TPCH_Q16_EXCL_TYPE)
        & part["p_size"].isin(TPCH_Q16_SIZES)
    ).to_numpy()
    supp = (
        _tpch_read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    good_supp = np.sort(supp.loc[supp.s_acctbal >= 0, "s_suppkey"].to_numpy())
    lut = ray.put(
        {
            "pk": part["p_partkey"].to_numpy(),
            "ok": pmask,
            "brand": part["p_brand"].to_numpy(),
            "type": part["p_type"].to_numpy(),
            "size": part["p_size"].to_numpy().astype(np.int64),
            "gs": good_supp,
        }
    )

    def local(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pidx, phit = _ss_gather(lut["pk"], pk)
        _, shit = _ss_gather(lut["gs"], sk)
        keep = phit & lut["ok"][pidx] & shit
        pidx = pidx[keep]
        t = pa.table(
            {
                "p_brand": pa.array(lut["brand"][pidx], pa.string()),
                "p_type": pa.array(lut["type"][pidx], pa.string()),
                "p_size": pa.array(lut["size"][pidx], pa.int64()),
                "l_suppkey": pa.array(sk[keep].astype(np.int64)),
            }
        )
        # local dedup: shrink the exchange to distinct quads per batch
        g = t.group_by(["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate([])
        return g

    quads = broadcast_map_batches(
        _tpch_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]), local, {"lut": lut}
    )
    distinct = quads.groupby(["p_brand", "p_type", "p_size", "l_suppkey"]).count()
    agg = (
        distinct.map_batches(
            lambda b: b.select(["p_brand", "p_type", "p_size"]), batch_format="pyarrow"
        )
        .groupby(["p_brand", "p_type", "p_size"])
        .count()
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "p_brand": b["p_brand"],
                "p_type": b["p_type"],
                "p_size": b["p_size"],
                "supplier_cnt": pc.cast(b["count()"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 small-quantity-order revenue: the correlated
    `l_quantity < 0.2 * AVG(l_quantity per part)` is evaluated EXACTLY as
    qty*5*cnt < sum_qty (integers — no float average anywhere). The
    brand/size-pruned lineitem subset (a few percent) is materialized once;
    per-part (sum,cnt) stats come off it as a part-bounded groupby and
    return as a broadcast lookup for the second, filtering pass. The full
    lineitem is scanned exactly once."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    part = _tpch_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    pkeys = np.sort(
        part.loc[
            (part.p_brand == TPCH_Q17_BRAND) & (part.p_size <= TPCH_Q17_MAX_SIZE),
            "p_partkey",
        ].to_numpy()
    )
    pref = ray.put({"pk": pkeys})

    def prune(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, hit = _ss_gather(lut["pk"], pk)
        b = b.filter(pa.array(hit))
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "qty": pa.array(
                    b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "price_c": pa.array(
                    _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )

    subset = broadcast_map_batches(
        _tpch_read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]),
        prune,
        {"lut": pref},
    ).materialize()  # brand-pruned: a few % of lineitem, 3 slim columns

    stats = (
        subset.map_batches(
            lambda b: pa.table(
                {"l_partkey": b["l_partkey"], "sum_qty": b["qty"], "cnt": pa.array(np.ones(b.num_rows, dtype=np.int64))}
            )
            .group_by("l_partkey")
            .aggregate([("sum_qty", "sum"), ("cnt", "sum")])
            .rename_columns(["l_partkey", "sum_qty", "cnt"]),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .sum(["sum_qty", "cnt"])
        .to_pandas()
        .sort_values("l_partkey")
    )
    sref = ray.put(
        {
            "pk": stats["l_partkey"].to_numpy(),
            "sq": stats["sum(sum_qty)"].to_numpy().astype(np.int64),
            "ct": stats["sum(cnt)"].to_numpy().astype(np.int64),
        }
    )

    def small(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx, _ = _ss_gather(lut["pk"], pk)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        keep = qty * 5 * lut["ct"][idx] < lut["sq"][idx]
        price = b["price_c"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "total_cents": pa.array([int(price.sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    parts = broadcast_map_batches(subset, small, {"lut": sref})
    total = int(parts.sum("total_cents") or 0)
    n = int(parts.sum("n_lines") or 0)
    return pa.table(
        {
            "total_cents": pa.array([total], pa.int64()),
            "n_lines": pa.array([n], pa.int64()),
            "avg_yearly_cents": pa.array([total / 7.0], pa.float64()),
        }
    )


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 large-volume customers: per-order quantity rollup with
    map-side combine, HAVING > threshold applied to the aggregate, then
    one hash join back to orders (big-big) and a broadcast custkey->name
    hop. Dates leave as strings (exact calendar days)."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches
    from incubator_sedona_ray.state.blocks import equi_join_auto

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "sum_qty": pa.array(
                    b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )
        return t.group_by("l_orderkey").aggregate([("sum_qty", "sum")]).rename_columns(["l_orderkey", "sum_qty"])

    big = (
        _tpch_read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("sum_qty")
        .map_batches(
            lambda b: pa.table(
                {"l_orderkey": b["l_orderkey"], "sum_qty": pc.cast(b["sum(sum_qty)"], pa.int64())}
            ).filter(pc.greater(pc.cast(b["sum(sum_qty)"], pa.int64()), TPCH_Q18_MIN_QTY)),
            batch_format="pyarrow",
        )
    )
    j = equi_join_auto(
        big,
        _tpch_read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        "inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=_tpch_jp(),
        scrub_right=False,
    )
    cust = (
        _tpch_read(sf_dir, "customer", ["c_custkey", "c_name"])
        .to_pandas()
        .sort_values("c_custkey")
    )
    cref = ray.put({"ck": cust["c_custkey"].to_numpy(), "cn": cust["c_name"].to_numpy()})

    def fin(b: pa.Table, lut) -> pa.Table:
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx, _ = _ss_gather(lut["ck"], keys)
        return pa.table(
            {
                "c_custkey": pa.array(keys.astype(np.int64)),
                "c_name": pa.array(lut["cn"][idx], pa.string()),
                "o_orderkey": b["l_orderkey"],
                "o_orderdate": pc.strftime(
                    pc.cast(b["o_orderdate"], pa.timestamp("s")), format="%Y-%m-%d"
                ),
                "o_totalprice_cents": pa.array(
                    _cents(b["o_totalprice"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
                "sum_qty": b["sum_qty"],
            }
        )

    return broadcast_map_batches(j, fin, {"lut": cref})


TPCH_Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 discounted revenue: the OR-of-ANDs brand/size/quantity
    predicate evaluates as three vectorized masks against broadcast part
    attribute arrays — one lineitem scan, per-batch int64 partial, single
    global sum, zero shuffles."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    part = (
        _tpch_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    lut = ray.put(
        {
            "pk": part["p_partkey"].to_numpy(),
            "brand": part["p_brand"].to_numpy(),
            "size": part["p_size"].to_numpy().astype(np.int64),
        }
    )

    def partial(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx, hit = _ss_gather(lut["pk"], pk)
        brand = lut["brand"][idx]
        size = lut["size"][idx]
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        m = np.zeros(len(pk), dtype=bool)
        for br, s_lo, s_hi, q_lo, q_hi in TPCH_Q19_BRANCHES:
            m |= (brand == br) & (size >= s_lo) & (size <= s_hi) & (qty >= q_lo) & (qty <= q_hi)
        m &= hit
        rev = _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]) * (
            100 - _cents(b["l_discount"].to_numpy(zero_copy_only=False)[m])
        )
        return pa.table({"rev": pa.array([int(rev.sum())], pa.int64())})

    li = _tpch_read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )
    total = int(broadcast_map_batches(li, partial, {"lut": lut}).sum("rev") or 0)
    return pa.table({"revenue_cents2": pa.array([total], pa.int64())})


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 potential part promotion (adapted: availqty > half of
    shipped quantity becomes per-(supplier,part) shipped quantity above a
    threshold, no partsupp): lineitem pruned at the batch by broadcast
    partkey set + ship-year window, per-pair map-side combine, one
    pair-bounded groupby, HAVING, then distinct suppliers re-attach
    name/nation via broadcast and filter to the target region."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    lo, hi = np.datetime64(TPCH_Q20_LO), np.datetime64(TPCH_Q20_HI)
    part = _tpch_read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    pkeys = np.sort(part.loc[part.p_name.str.startswith("small"), "p_partkey"].to_numpy())
    pref = ray.put({"pk": pkeys})

    def partial(b: pa.Table, lut) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, hit = _ss_gather(lut["pk"], pk)
        b = b.filter(pa.array(hit))
        t = pa.table(
            {
                "l_suppkey": b["l_suppkey"],
                "l_partkey": b["l_partkey"],
                "qty": pa.array(
                    b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )
        return (
            t.group_by(["l_suppkey", "l_partkey"]).aggregate([("qty", "sum")]).rename_columns(["l_suppkey", "l_partkey", "qty"])
        )

    pairs = (
        broadcast_map_batches(
            _tpch_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]),
            partial,
            {"lut": pref},
        )
        .groupby(["l_suppkey", "l_partkey"])
        .sum("qty")
        .map_batches(
            lambda b: b.filter(
                pc.greater(pc.cast(b["sum(qty)"], pa.int64()), TPCH_Q20_MIN_QTY)
            ).select(["l_suppkey"]),
            batch_format="pyarrow",
        )
    )
    supps = pairs.groupby("l_suppkey").count()  # distinct suppliers

    nat = (
        ray.data.read_parquet(os.path.join(sf_dir, "nation.parquet"))
        .to_pandas()
        .sort_values("n_nationkey")
    )
    region_of = nat["n_regionkey"].to_numpy().astype(np.int64)
    supp = (
        _tpch_read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sref = ray.put(
        {
            "sk": supp["s_suppkey"].to_numpy(),
            "sn": supp["s_name"].to_numpy(),
            "nat": supp["s_nationkey"].to_numpy().astype(np.int64),
            "rg": region_of,
        }
    )

    def fin(b: pa.Table, lut) -> pa.Table:
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        idx, _ = _ss_gather(lut["sk"], keys)
        keep = lut["rg"][lut["nat"][idx]] == TPCH_Q20_REGION
        return pa.table(
            {
                "s_suppkey": pa.array(keys[keep].astype(np.int64)),
                "s_name": pa.array(lut["sn"][idx][keep], pa.string()),
            }
        )

    return broadcast_map_batches(supps, fin, {"lut": sref})


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 suppliers who kept orders waiting (adapted: "late" is
    l_shipdate > o_orderdate + 90 days — the synthetic schema has no
    commit/receipt dates): the EXISTS / NOT-EXISTS pair over other
    suppliers of the same order is computed WITHOUT self-joins — per
    (orderkey, suppkey) a max(late) rollup, then per orderkey three
    standard aggregates (supplier count, late-supplier count, and the late
    supplier's key via min(suppkey | late ? 0 : +INF)); orders with >= 2
    suppliers and exactly one late supplier charge that supplier. One
    big-big join + two bounded groupbys."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches
    from incubator_sedona_ray.state.blocks import equi_join_auto

    BIG = np.int64(2**62)

    ords = _tpch_read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "F")).select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )
    li = _tpch_read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    # size-adaptive: the F-filtered orders projection broadcast-probes when
    # it fits (zero shuffle); beyond the threshold this is the same
    # big-big hash join as before
    j = equi_join_auto(
        li, ords, "inner", _tpch_jp(), on=("l_orderkey",), right_on=("o_orderkey",),
        scrub_left=False,
    )

    NB = _tpch_jp() * 4

    def pair_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False)
        od = b["o_orderdate"].to_numpy(zero_copy_only=False)
        late = (ship > od + np.timedelta64(TPCH_Q21_LATE_DAYS, "D")).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "late": pa.array(late),
            }
        )
        t = (
            t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("late", "max")]).rename_columns(["l_orderkey", "l_suppkey", "late"])
        )
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_b", pa.array(ok % NB))

    # ONE bucket exchange (orderkeys co-locate by ok % NB); inside each
    # bucket a numpy kernel finishes the (order, supplier) max-late rollup,
    # the per-order triple aggregate, and the exactly-one-late pick — the
    # former plan's two generic groupbys over ~600k/150k keys were ~10x
    # the kernel cost (Ray's sort-based groupby at high key cardinality)
    def order_kernel(g: pa.Table) -> pa.Table:
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        late = g["late"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, late = ok[order], sk[order], late[order]
        # (ok, sk) runs -> max(late) per pair
        new_pair = np.ones(len(ok), dtype=bool)
        new_pair[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pstart = np.nonzero(new_pair)[0]
        pl = np.maximum.reduceat(late, pstart) if len(pstart) else late[:0]
        pok, psk = ok[pstart], sk[pstart]
        # per-order aggregates over pair rows
        new_ord = np.ones(len(pok), dtype=bool)
        new_ord[1:] = pok[1:] != pok[:-1]
        ostart = np.nonzero(new_ord)[0]
        if not len(ostart):
            return pa.table({"s_suppkey": pa.array(np.empty(0, dtype=np.int64)), "cnt": pa.array(np.empty(0, dtype=np.int64))})
        ns = np.diff(np.append(ostart, len(pok)))
        nl = np.add.reduceat(pl, ostart)
        lk = np.minimum.reduceat(np.where(pl == 1, psk, BIG), ostart)
        keep = (ns >= 2) & (nl == 1)
        supp = lk[keep]
        u, c = np.unique(supp, return_counts=True)
        return pa.table({"s_suppkey": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    waits = (
        j.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(order_kernel, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("cnt")
    )

    supp = (
        _tpch_read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    names = _nation_names(sf_dir)
    sref = ray.put(
        {
            "sk": supp["s_suppkey"].to_numpy(),
            "sn": supp["s_name"].to_numpy(),
            "nat": supp["s_nationkey"].to_numpy().astype(np.int64),
        }
    )

    def fin(b: pa.Table, lut) -> pa.Table:
        keys = b["s_suppkey"].to_numpy(zero_copy_only=False)
        idx, _ = _ss_gather(lut["sk"], keys)
        keep = names[lut["nat"][idx]] == TPCH_Q21_NATION
        return pa.table(
            {
                "s_name": pa.array(lut["sn"][idx][keep], pa.string()),
                "numwait": pc.cast(b["sum(cnt)"], pa.int64()).filter(pa.array(keep)),
            }
        )

    return broadcast_map_batches(waits, fin, {"lut": sref})


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 global sales opportunity (adapted: country code is the
    nation key — no c_phone — and the anti-join excludes customers with an
    URGENT order, since every synthetic customer has at least one order):
    the `> AVG(positive balances)` scalar is evaluated EXACTLY as
    bal*n > sum over integer cents; the NOT EXISTS is a distributed
    left-anti hash join."""
    from incubator_sedona_ray.state.blocks import equi_join_auto

    codes = np.array(TPCH_Q22_CODES, dtype=np.int64)

    def base_fn(b: pa.Table) -> pa.Table:
        nat = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nat, codes)
        return pa.table(
            {
                "c_custkey": b["c_custkey"].filter(pa.array(keep)),
                "cntrycode": pa.array(nat[keep]),
                "bal_c": pa.array(
                    _cents(b["c_acctbal"].to_numpy(zero_copy_only=False)[keep]), pa.int64()
                ),
            }
        )

    base = _tpch_read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        base_fn, batch_format="pyarrow"
    ).materialize()  # customer-bounded slim projection; read twice otherwise

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b["bal_c"].to_numpy(zero_copy_only=False)
        pos = bal[bal > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    stats = base.map_batches(pos_partial, batch_format="pyarrow")
    s = int(stats.sum("s") or 0)
    n = int(stats.sum("n") or 0)

    urgent = _tpch_read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    anti = equi_join_auto(
        base, urgent, "left_anti", on=("c_custkey",), right_on=("o_custkey",),
        num_partitions=_tpch_jp(),
    )

    def rollup(b: pa.Table) -> pa.Table:
        bal = b["bal_c"].to_numpy(zero_copy_only=False)
        keep = bal * n > s
        t = pa.table(
            {
                "cntrycode": b["cntrycode"].filter(pa.array(keep)),
                "numcust": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "totacctbal_cents": pa.array(bal[keep], pa.int64()),
            }
        )
        return (
            t.group_by("cntrycode")
            .aggregate([("numcust", "sum"), ("totacctbal_cents", "sum")])
            .rename_columns(["cntrycode", "numcust", "totacctbal_cents"])
        )

    agg = anti.map_batches(rollup, batch_format="pyarrow").groupby("cntrycode").sum(
        ["numcust", "totacctbal_cents"]
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["cntrycode", "numcust", "totacctbal_cents"]),
        batch_format="pyarrow",
    )


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp, so the cost of
    a (part, supplier) pair is the MINIMUM extended price that supplier
    ever charged for that part in lineitem): region-pruned suppliers and
    size-pruned parts ride as broadcast sets, per-pair min rolls up
    map-side, and the correlated `= (SELECT MIN(...))` join-back runs
    inside a per-part map_groups — one bounded groupby, no second scan."""
    from incubator_sedona_ray.partition.assign import broadcast_map_batches

    part = _tpch_read(sf_dir, "part", ["p_partkey", "p_name", "p_size"]).to_pandas()
    part = part[part.p_size == TPCH_Q2_SIZE].sort_values("p_partkey")
    nat = (
        ray.data.read_parquet(os.path.join(sf_dir, "nation.parquet"))
        .to_pandas()
        .sort_values("n_nationkey")
    )
    region_of = nat["n_regionkey"].to_numpy().astype(np.int64)
    names = nat["n_name"].to_numpy()
    supp = (
        _tpch_read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    supp = supp[region_of[supp["s_nationkey"].to_numpy()] == TPCH_Q2_REGION]
    lut = ray.put(
        {
            "pk": part["p_partkey"].to_numpy(),
            "pn": part["p_name"].to_numpy(),
            "sk": supp["s_suppkey"].to_numpy(),
            "sn": supp["s_name"].to_numpy(),
            "sb": _cents(supp["s_acctbal"].to_numpy()),
            "snat": supp["s_nationkey"].to_numpy().astype(np.int64),
        }
    )

    def partial(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, ph = _ss_gather(lut["pk"], pk)
        _, sh = _ss_gather(lut["sk"], sk)
        b = b.filter(pa.array(ph & sh))
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "cost_c": pa.array(
                    _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )
        return (
            t.group_by(["l_partkey", "l_suppkey"]).aggregate([("cost_c", "min")]).rename_columns(["l_partkey", "l_suppkey", "cost_c"])
        )

    pairs = (
        broadcast_map_batches(
            _tpch_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]),
            partial,
            {"lut": lut},
        )
        .groupby(["l_partkey", "l_suppkey"])
        .min("cost_c")
    )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        mc = df["min(cost_c)"].min()
        return df[df["min(cost_c)"] == mc]

    winners = pairs.groupby("l_partkey").map_groups(per_part, batch_format="pandas")

    def fin(b: pa.Table, lut) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pidx, _ = _ss_gather(lut["pk"], pk)
        sidx, _ = _ss_gather(lut["sk"], sk)
        return pa.table(
            {
                "p_partkey": pa.array(pk.astype(np.int64)),
                "p_name": pa.array(lut["pn"][pidx], pa.string()),
                "s_name": pa.array(lut["sn"][sidx], pa.string()),
                "n_name": pa.array(names[lut["snat"][sidx]], pa.string()),
                "s_acctbal_cents": pa.array(lut["sb"][sidx], pa.int64()),
                "cost_cents": pc.cast(b["min(cost_c)"], pa.int64()),
            }
        )

    return broadcast_map_batches(winners, fin, {"lut": lut})


DSIR_K = 50
DSIR_TARGET_LANG = "en"


def _dsir_sql() -> str:
    """DuckDB replica of dsir_select: exact integer ratio table via
    LEFT JOIN + add-one smoothing, BIGINT floor divisions throughout."""
    from incubator_sedona_ray.text.dsir import DSIR_SCALE

    return (
        r"WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w FROM documents), "
        "cr AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w), "
        r"ttoks AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w "
        f"FROM documents WHERE lang = '{DSIR_TARGET_LANG}'), "
        "ct AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ttoks GROUP BY w), "
        f"ratio AS (SELECT cr.w, ((COALESCE(ct.c, 0) + 1) * {DSIR_SCALE}) // (cr.c + 1) AS r "
        "FROM cr LEFT JOIN ct USING (w)), "
        "sc AS (SELECT doc_id, CAST(SUM(r) AS BIGINT) AS score FROM toks JOIN ratio USING (w) GROUP BY doc_id), "
        "f AS (SELECT d.doc_id, COALESCE(score, CAST(0 AS BIGINT)) AS score FROM documents d LEFT JOIN sc USING (doc_id)) "
        "SELECT doc_id, score, rank FROM (SELECT doc_id, score, "
        "row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM f) "
        f"WHERE rank <= {DSIR_K}"
    )


def _q_dsir(sf_dir: str, mode: str):
    from incubator_sedona_ray.text.dsir import dsir_select

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda b: b.filter(pc.equal(b["lang"], DSIR_TARGET_LANG)).select(["text"]),
        batch_format="pyarrow",
    )
    return dsir_select(docs, target, DSIR_K, mode=mode)


def q_dsir_select(sf_dir: str):
    """DSIR importance selection (text/dsir.py, Xie et al. 2023 adapted to
    exact integers): target = the corpus's own English documents, keep the
    50 most target-like by the fixed-point unigram importance sum.
    Broadcast mode: vocabulary-bounded ratio table shipped once, one
    zero-shuffle scoring pass, mergeable top-k."""
    return _q_dsir(sf_dir, "broadcast")


def q_dsir_select_join(sf_dir: str):
    """The same selection through the join engine (the 100 TB path for
    vocabularies beyond driver memory): distributed ratio table via
    inner+anti joins, exploded-token hash join, bucketed per-doc sums —
    bit-identical to broadcast mode and to the SQL oracle."""
    return _q_dsir(sf_dir, "join")


CF_MIN_WORDS = 25
CF_MAX_DUP2 = 0.04
CF_MIN_ALPHA = 0.815
CF_MWL_LO, CF_MWL_HI = 4.3, 4.7


def q_corpus_filter(sf_dir: str):
    """The composed C4/Gopher keep/drop chain as ONE fused stateless stage:
    quality signals (byte-mask counts) + repetition fractions (dict-encode
    lexsort kernels) + mean-word-length, then the conjunctive keep rule
    n_words >= 25 AND dup_2gram_frac <= 0.04 AND alpha_ratio >= 0.815 AND
    mwl in [4.3, 4.7]. All features are bit-deterministic vs the SQL
    replicas (integer sums, exact double divisions), so the kept set is
    exact. Zero shuffles — the whole filter streams."""
    from incubator_sedona_ray.text.analysis import quality_fn
    from incubator_sedona_ray.text.bm25 import _tokenize
    from incubator_sedona_ray.text.repetition import repetition_batch

    qfn = quality_fn()

    def feats(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        b = repetition_batch(qfn(b))
        flat, parent = _tokenize(b["text"])
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        tot = np.bincount(parent, weights=lens.astype(np.float64), minlength=b.num_rows)
        nw = b["n_words"].to_numpy(zero_copy_only=False)
        mwl = tot / np.maximum(nw, 1)
        b = b.append_column("mwl", pa.array(mwl, type=pa.float64()))
        keep = (
            (nw >= CF_MIN_WORDS)
            & (b["dup_2gram_frac"].to_numpy(zero_copy_only=False) <= CF_MAX_DUP2)
            & (b["alpha_ratio"].to_numpy(zero_copy_only=False) >= CF_MIN_ALPHA)
            & (mwl >= CF_MWL_LO)
            & (mwl <= CF_MWL_HI)
        )
        return b.filter(pa.array(keep))

    out = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(feats, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_words", "alpha_ratio", "dup_2gram_frac", "mwl"])


_DOMAIN_TLDS = ("com", "org", "co.uk", "de", "net")


def q_domain_stats(sf_dir: str):
    """Registrable-domain corpus accounting (RefinedWeb-style): parse urls
    (scheme/host/public-suffix-lite domain/path depth) with pure RE2
    kernels, then per-domain doc count + char totals via map-side partial
    aggregation — only the tiny (domain, n, chars) partials shuffle."""
    from incubator_sedona_ray.text.urls import domain_stats

    docs = _docs(sf_dir, columns=["doc_id", "n_chars"])

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls = [
            f"https://site{int(i) % 37}.{_DOMAIN_TLDS[int(i) % 5]}"
            + (f"/a/b/{int(i)}" if i % 3 == 0 else f"/p/{int(i)}")
            for i in ids
        ]
        return batch.append_column("url", pa.array(urls))

    return domain_stats(docs.map_batches(mk, batch_format="pyarrow"))


SEQ_LEN = 24


def q_seq_chunks(sf_dir: str):
    """LM-pretraining sequence chunking (text/packing.py): each doc's token
    stream splits into seq_len-token chunks (trailing partial kept) —
    per-document on purpose, so the output is deterministic row-for-row at
    any parallelism. One stateless vectorized map_batches, no shuffle."""
    from incubator_sedona_ray.text.packing import seq_chunks

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return seq_chunks(ds, SEQ_LEN)


BM25_TERMS = ("table", "sort", "hash")
BM25_K = 25
BM25_K1, BM25_B = 1.2, 0.75


def q_bm25_topk(sf_dir: str):
    """Distributed BM25 retrieval (text/bm25.py): stats pass (N, avgdl,
    per-query-term df as O(#batches) partial aggregates), broadcast idf,
    vectorized scoring with per-batch local top-k, exact mergeable global
    top-k. Scores are float64 with oracle-matched evaluation order; the
    query returns (doc_id, rank) — ranks agree because ties are exact and
    broken by doc_id in both engines."""
    from incubator_sedona_ray.text.bm25 import bm25_topk

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = bm25_topk(ds, list(BM25_TERMS), BM25_K, k1=BM25_K1, b=BM25_B)
    return out.select_columns(["doc_id", "rank"])


def _ann_queries(ds) -> pd.DataFrame:
    """The ANN_NQ lowest-id embedding rows as the query set — extracted via
    a distributed FILTER (vec_ids are 0..n-1), never a full to_pandas: at
    100 TB the old sort_values-on-the-driver pattern is an OOM."""
    small = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], ANN_NQ)), batch_format="pyarrow"
    ).to_pandas()
    return small.sort_values("vec_id").rename(columns={"vec_id": "query_id", "embedding": "qvec"})


def q_ann_topk(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = topk_cosine(ds, _ann_queries(ds), k=ANN_K)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_embed_dup_pairs(sf_dir: str):
    from incubator_sedona_ray.dedup import embedding_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_dedup(ds, threshold=EMB_DUP_THRESHOLD, brute=True)
    return pairs.select_columns(["a", "b"])


def q_window_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def add_hour(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.append_column("hour_id", pa.array(us // 3_600_000_000))

    out = (
        ev.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour_id"])
        .aggregate(Count(alias_name="n"), Min("value", alias_name="min_value"), Max("value", alias_name="max_value"))
    )
    return out


def q_sessionize(sf_dir: str):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    # shuffle by a coarse hash of user_id: one vectorized kernel per
    # PARTITION handles every user inside it (lexsort + reduceat), so the
    # Python-call count is O(partitions), not O(users)
    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((uid * np.int64(0x9E3779B1)) % n_parts + n_parts) % n_parts
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        new_user = np.empty(len(uid), dtype=bool)
        new_user[:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (us[1:] - us[:-1]) > SESSION_GAP_US
        firsts = np.flatnonzero(new_user)
        return pd.DataFrame(
            {
                "user_id": uid[firsts],
                "n_sessions": np.add.reduceat(new_sess.astype(np.int64), firsts),
            }
        )

    parted = ev.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(sessions_part, batch_format="pandas")


def q_top_users(sf_dir: str):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    counts = _rename(ev.groupby("user_id").count(), {"count()": "n"})

    # mergeable top-k: each block keeps its local top 10, the driver merges
    # only <= 10*n_blocks rows (never the full per-user count table)
    def local_top(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((uid, -n))[:10]
        return batch.take(sel)

    small = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    df = small.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort").head(10)
    return df.reset_index(drop=True)


def q_multimodal_meta(sf_dir: str):
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        payload = pa.array([t.encode() for t in batch["text"].to_pylist()], type=pa.binary())
        return pa.table({"doc_id": batch["doc_id"], "payload": payload})

    out = docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        payload_meta_fn("payload"), batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "n_bytes", "sha_prefix"])


# -- rows-only (non-SQL-expressible) ----------------------------------------

def q_s2_cells(sf_dir: str):
    def add(batch: pa.Table) -> pa.Table:
        cells = _s2.cells_for_points(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            10,
        )
        return pa.table({"doc_id": batch["doc_id"], "s2_cell": pa.array(cells)})

    return _geo_docs(sf_dir).map_batches(add, batch_format="pyarrow")


def q_geohash(sf_dir: str):
    def add(batch: pa.Table) -> pa.Table:
        gh = _geohash.encode_many(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            6,
        )
        return pa.table({"doc_id": batch["doc_id"], "geohash": pa.array(list(gh), type=pa.string())})

    return _geo_docs(sf_dir).map_batches(add, batch_format="pyarrow")


def q_h3_cells(sf_dir: str):
    def add(batch: pa.Table) -> pa.Table:
        cells = _h3.cell_ids(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            5,
        )
        return pa.table({"doc_id": batch["doc_id"], "hex_cell": pa.array(cells)})

    return _geo_docs(sf_dir).map_batches(add, batch_format="pyarrow")


def q_langid(sf_dir: str):
    out = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=2
    )
    return out.select_columns(["doc_id", "lang_pred"])


def q_minhash_survivors(sf_dir: str):
    # fresh read_parquet corpus -> scrub_input=False keeps the id and text
    # sides of the verification joins fully streaming (100 TB path)
    survivors, _ = minhash_dedup(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, scrub_input=False
    )
    return survivors


def q_simhash(sf_dir: str):
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        simhash_batch_fn(), batch_format="pyarrow"
    )


JAC_THRESHOLD = 0.35


def q_jaccard_pairs(sf_dir: str):
    """EXACT word-3-gram Jaccard all-pairs (prefix-filtered set-similarity
    self-join, dedup/ssjoin.py) — the deterministic counterpart to the
    probabilistic minhash path; the SQL oracle recomputes Jaccard on the
    n-gram STRING sets (hash sets are equivalent modulo FNV collisions)."""
    from incubator_sedona_ray.dedup import jaccard_self_join

    return jaccard_self_join(_docs(sf_dir, columns=["doc_id", "text"]), threshold=JAC_THRESHOLD)


def q_jaccard_pairs_ids(sf_dir: str):
    """Same exact join through the carry="ids" large-document plan (slim
    token shuffle + candidate hash-join back to the signature table) with
    df-ordered prefixes — both plan variants against one oracle, like the
    pip_join family."""
    from incubator_sedona_ray.dedup import jaccard_self_join

    return jaccard_self_join(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=JAC_THRESHOLD, order="df", carry="ids"
    )


def q_fingerprint(sf_dir: str):
    out = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fingerprint_fn(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


def q_ann_topk_lsh(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = topk_cosine_lsh(ds, _ann_queries(ds), k=ANN_K, n_planes=8, n_probe=64)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_ann_topk_pq(sf_dir: str):
    """Two-stage PQ search: distributed per-subspace codebook training
    (kmeans), streaming uint8 encode, LUT shortlist, exact re-rank.
    Deterministic end-to-end -> golden-fixture oracle."""
    from incubator_sedona_ray.ann import pq_encode, pq_fit, pq_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    books = pq_fit(ds, m=8, n_codes=32, iters=4)
    enc = pq_encode(ds, books)
    out = pq_topk(enc, _ann_queries(ds), books, k=ANN_K, rerank_ds=ds, expand=5)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_ann_topk_ivf(sf_dir: str):
    """IVF-Flat search: coarse k-means lists, per-query probe of the 2
    nearest lists, exact cosine inside. Deterministic -> fixture oracle."""
    from incubator_sedona_ray.ann import ivf_build, ivf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    indexed, cent = ivf_build(ds, 8, iters=4)
    out = ivf_topk(indexed, _ann_queries(ds), cent, k=ANN_K, n_probe=2)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_ann_topk_ivf_pruned(sf_dir: str):
    """IVF with STORAGE pruning (the 100 TB layout): the indexed corpus is
    written partitioned by list id (ivf_write), and the probe reads ONLY
    the probed ``list=<id>`` partitions — scanned rows ~ n_probe/n_lists
    of the corpus (tests/test_dedup_text_ann.py asserts the ratio).
    Results are identical to ann_topk_ivf, so it shares that fixture."""
    import shutil
    import tempfile

    from incubator_sedona_ray.ann import ivf_build, ivf_topk_pruned, ivf_write

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    indexed, cent = ivf_build(ds, 8, iters=4)
    path = tempfile.mkdtemp(prefix="ivf_lists_", dir="/tmp")
    try:
        ivf_write(indexed, path)
        out, _scanned = ivf_topk_pruned(path, _ann_queries(ds), cent, k=ANN_K, n_probe=2)
        return out.select_columns(["query_id", "vec_id", "rank"]).materialize()
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing (fake raw-stream decode, actor pool):
    one output row per sampled 256-byte frame (every 2nd). Closed-form SQL
    oracle slices the source text (chars == bytes on this ASCII corpus; a
    real codec oracle is impossible without ffmpeg)."""
    from incubator_sedona_ray.sources.multimodal import SampleFrames

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        payload = pa.array([t.encode() for t in batch["text"].to_pylist()], type=pa.binary())
        return pa.table({"doc_id": batch["doc_id"], "payload": payload})

    out = docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        SampleFrames, fn_constructor_kwargs={"fake": True}, concurrency=2,
        batch_size=64, batch_format="pyarrow",
    )
    return out


def q_image_resize(sf_dir: str):
    """REAL thumbnailing: synthesized PNG payloads -> pure-numpy decode ->
    bilinear resample into an 8px box (half-pixel-center convention,
    ``raster/resize.py``) -> PNG re-encode, in one actor-pool stage.
    ~3% of payloads are corrupted to exercise the skip-invalid nulls.
    Golden-fixture oracle pins the resized dims AND the sha256 of the
    re-encoded thumbnail bytes (bit-exact resample + encode)."""
    import hashlib as _hl

    from incubator_sedona_ray.raster.viz import png_encode_rgb
    from incubator_sedona_ray.sources.multimodal import ResizeImage

    docs = _docs(sf_dir, columns=["doc_id"])

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            w = 6 + int(i) % 17
            h = 5 + int(i) % 11
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 41 + int(i)) % 256, (yy * 23 + int(i) * 5) % 256, (xx + yy * 3 + int(i)) % 256],
                axis=2,
            ).astype(np.uint8)
            blob = png_encode_rgb(img)
            if int(i) % 37 == 0:
                blob = blob[: len(blob) // 3]
            payloads.append(blob)
        return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(payloads, type=pa.binary())})

    out = docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        ResizeImage,
        fn_constructor_kwargs={"codec": "png", "max_side": 8},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )

    def finish(batch: pa.Table) -> pa.Table:
        blobs = batch["resized_payload"].to_pylist()
        sha = pa.array(
            [None if b is None else _hl.sha256(b).hexdigest()[:16] for b in blobs],
            type=pa.string(),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "resized_width": batch["resized_width"],
                "resized_height": batch["resized_height"],
                "thumb_sha": sha,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_frame_sample_mjpeg(sf_dir: str):
    """REAL video frame sampling: deterministic per-doc JPEG frames ->
    MJPG AVI container (``sources/avi.py``) -> RIFF walk + every-2nd-chunk
    sample with digest, byte length and SOF-header dims (no full pixel
    decode on the sampling path). Golden-fixture oracle (JPEG bit streams
    have no SQL closed form); the committed fixture also pins the
    avi_encode->avi_decode_frames round trip."""
    from incubator_sedona_ray.raster.jpeg import jpeg_encode
    from incubator_sedona_ray.sources.avi import avi_encode
    from incubator_sedona_ray.sources.multimodal import SampleFrames

    n_docs = 400

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = []
        for d in ids:
            d = int(d)
            w, h = 16 + d % 13, 12 + d % 7
            yy, xx = np.mgrid[0:h, 0:w]
            frames = []
            for k in range(3 + d % 4):
                img = np.stack(
                    [(xx * 3 + d + k) % 256, (yy * 5 + k) % 256, ((xx + yy) * 2 + d) % 256],
                    axis=2,
                ).astype(np.uint8)
                frames.append(jpeg_encode(img, quality=80))
            blobs.append(avi_encode(frames, width=w, height=h, fps=10))
        return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(blobs, type=pa.binary())})

    docs = _docs(sf_dir, columns=["doc_id"]).map_batches(
        lambda t: t.filter(pa.compute.less(t["doc_id"], n_docs)), batch_format="pyarrow"
    )
    return docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        SampleFrames,
        fn_constructor_kwargs={"codec": "mjpeg-avi", "stride": 2, "decode_dims": True},
        concurrency=2,
        batch_size=64,
        batch_format="pyarrow",
    )


def q_audio_features(sf_dir: str):
    """Windowed audio feature extraction (fake raw-PCM decode, actor pool):
    one row per 512-byte window with its mean byte level. Closed-form SQL
    oracle sums codepoints per window (== bytes on this ASCII corpus)."""
    from incubator_sedona_ray.sources.multimodal import AudioFeatures

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        payload = pa.array([t.encode() for t in batch["text"].to_pylist()], type=pa.binary())
        return pa.table({"doc_id": batch["doc_id"], "payload": payload})

    return docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        AudioFeatures, fn_constructor_kwargs={"fake": True}, concurrency=2,
        batch_size=64, batch_format="pyarrow",
    )


def q_audio_features_wav(sf_dir: str):
    """REAL windowed audio analysis: deterministic PCM16 synthesis ->
    RIFF/WAVE encode -> pure-numpy WAV decode (``sources/wav.py``) ->
    per-512-sample window mean amplitude, RMS and zero-crossing count
    (actor pool, decoder state in ``__init__``). The SQL oracle recomputes
    the closed-form sample generator directly, so the encode -> decode
    round trip is verified end-to-end; all three features are exact in
    float64 (integer sums below 2**53, power-of-two divisors)."""
    from incubator_sedona_ray.sources.multimodal import AudioFeatures
    from incubator_sedona_ray.sources.wav import wav_encode

    docs = _docs(sf_dir, columns=["doc_id"])

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = []
        for d in ids:
            d = int(d)
            n = 1024 + (d % 3) * 512
            i = np.arange(n, dtype=np.int64)
            s = ((d * 131 + i * 7919) % 65536 - 32768).astype(np.int16)
            blobs.append(wav_encode(s, sample_rate=8000))
        return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(blobs, type=pa.binary())})

    return docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"codec": "wav", "window": 512},
        concurrency=2,
        batch_size=64,
        batch_format="pyarrow",
    )


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (semantic
    bucketing for diversity sampling): deterministic k-smallest-id init,
    5 broadcast+partial-sum rounds, streaming assignment. Golden-fixture
    oracle (float accumulation order is fixed by the block order, so the
    result is bit-stable for a fixed input)."""
    from incubator_sedona_ray.ann import kmeans_assign, kmeans_fit

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cent = kmeans_fit(ds, 8, iters=5)
    out = kmeans_assign(ds, cent)
    return out.select_columns(["vec_id", "cluster_id"])


def q_diversity_sample(sf_dir: str):
    """Cluster-balanced sampling: k-means bucket the embeddings, keep the
    10 smallest ids per cluster. Hybrid oracle: cluster ids come from the
    kmeans golden fixture; the per-cluster top-10 is a closed-form SQL
    window (row_number over cluster, id order)."""
    from incubator_sedona_ray.ann import kmeans_assign, kmeans_fit, sample_per_cluster

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cent = kmeans_fit(ds, 8, iters=5)
    assigned = kmeans_assign(ds, cent).select_columns(["vec_id", "cluster_id"])
    return sample_per_cluster(assigned, 10)


def q_flagship(sf_dir: str):
    out = flagship_pipeline(ray.data.read_parquet(f"{sf_dir}/documents.parquet"))
    return out.select_columns(["url", "lang", "lon", "lat", "s2_cell", "zone_zone_cc", "tile_id"])


def q_image_decode_fake(sf_dir: str):
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        payload = pa.array([t.encode() for t in batch["text"].to_pylist()], type=pa.binary())
        return pa.table({"doc_id": batch["doc_id"], "payload": payload})

    out = docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"bin_col": "payload", "fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )
    return out.select_columns(["doc_id", "img_width", "img_height", "img_channels"])


def q_image_decode_png(sf_dir: str):
    """REAL image decode over PNG payloads (raster/png.py pure-numpy codec,
    no PIL): payloads are tiny deterministic PNGs synthesized from each
    doc's id, decoded in an actor-pool stage that emits true dimensions,
    channel count and per-channel-mean + luma-histogram features. A ~3%
    slice of payloads is corrupted to exercise the on_error='null'
    skip-invalid path (FormatMapper allowTopologyInvalidGeometries idiom).
    Golden-fixture oracle (PNG bit streams have no SQL closed form)."""
    from incubator_sedona_ray.raster.viz import png_encode_rgb

    docs = _docs(sf_dir, columns=["doc_id"])

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            w = 4 + int(i) % 13
            h = 3 + int(i) % 7
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 37 + int(i)) % 256,
                    (yy * 59 + int(i) * 3) % 256,
                    (xx * yy + int(i) * 7) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            blob = png_encode_rgb(img)
            if int(i) % 31 == 0:  # corrupt ~3% to exercise skip-invalid
                blob = blob[: len(blob) // 2]
            payloads.append(blob)
        return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(payloads, type=pa.binary())})

    out = docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"bin_col": "payload", "codec": "png", "feat_dim": 6},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )

    def finish(batch: pa.Table) -> pa.Table:
        feats = batch["img_features"].to_pylist()
        mean_r = pa.array(
            [None if f is None else round(f[0], 9) for f in feats], type=pa.float64()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "img_width": batch["img_width"],
                "img_height": batch["img_height"],
                "img_channels": batch["img_channels"],
                "mean_r": mean_r,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_image_decode_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode (raster/jpeg.py pure-numpy codec, written
    from the public ITU-T T.81 spec — no libjpeg/PIL): deterministic JPEG
    payloads synthesized per doc (4:2:0 subsampled), decoded in an
    actor-pool stage; ~3% corrupted payloads exercise on_error='null'.
    Golden-fixture oracle."""
    from incubator_sedona_ray.raster.jpeg import jpeg_encode

    docs = _docs(sf_dir, columns=["doc_id"])

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            w = 12 + int(i) % 21
            h = 10 + int(i) % 13
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 11 + int(i)) % 256,
                    (yy * 17 + int(i) * 5) % 256,
                    ((xx + yy) * 23 + int(i) * 2) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            blob = jpeg_encode(img, quality=85)
            if int(i) % 37 == 0:
                blob = blob[: len(blob) // 3]
            payloads.append(blob)
        return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(payloads, type=pa.binary())})

    out = docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"bin_col": "payload", "codec": "auto", "feat_dim": 6},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )

    def finish(batch: pa.Table) -> pa.Table:
        feats = batch["img_features"].to_pylist()
        mean_r = pa.array([None if f is None else round(f[0], 9) for f in feats], type=pa.float64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "img_width": batch["img_width"],
                "img_height": batch["img_height"],
                "mean_r": mean_r,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_pip_join_salted(sf_dir: str):
    """Same join as pip_join but with aggressive salting forced on — the
    driver-level proof that salted repartition preserves the pair set."""
    zones = ray.data.from_arrow(_zones_table())
    joined = spatial_join(
        zones,
        _geo_docs(sf_dir),
        "covers",
        left_geom="geom",
        right_geom=("lon", "lat"),
        num_partitions=8,
        conf=SpatialConf(grid_type="kdbtree", salt_threshold=0.5, salt_max=4),
    )
    return _rename(joined.select_columns(["l_zone_id", "r_doc_id"]), {"l_zone_id": "zone_id", "r_doc_id": "doc_id"})


def q_knn_join_partitioned(sf_dir: str):
    """Expanding-radius partitioned kNN join — must equal the broadcast
    kNN join (and the SQL oracle) row-for-row."""
    from incubator_sedona_ray.join.knn import knn_join_partitioned

    queries = pd.DataFrame(KNN_QUERIES, columns=["query_id", "qx", "qy"])
    out = knn_join_partitioned(
        _geo_docs(sf_dir), queries, k=KNN_K, right_geom=("lon", "lat"), right_id="doc_id",
        initial_radius=8.0,
    )
    return out.select_columns(["query_id", "doc_id", "rank"])


def q_spatial_sort(sf_dir: str):
    """Spatial (cell-id) sort: order docs by grid cell then doc id — the
    locality-clustering step before writing spatially-clustered files.

    Global row numbers WITHOUT collecting the dataset: per-cell counts
    (a tiny groupby) cumsum to per-cell offsets on the driver; each cell's
    rows get offset + local rank inside a distributed map_groups."""
    cells = q_grid_cells(sf_dir)
    counts = cells.groupby("cell_id").count().to_pandas().sort_values("cell_id")
    n = counts["count()"].to_numpy()
    offs = dict(zip(counts["cell_id"], np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)))

    # coarse-partition kernel: one lexsort per partition ranks every cell
    # inside it (no per-cell Python); global offsets come from the tiny
    # per-cell count table above
    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        cid = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((cid * np.int64(0x9E3779B1)) % n_parts + n_parts) % n_parts
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        cid = g["cell_id"].to_numpy()
        did = g["doc_id"].to_numpy()
        order = np.lexsort((did, cid))
        cid, did = cid[order], did[order]
        new = np.empty(len(cid), dtype=bool)
        new[:1] = True
        new[1:] = cid[1:] != cid[:-1]
        firsts = np.flatnonzero(new)
        sizes = np.diff(np.append(firsts, len(cid)))
        local = np.arange(len(cid), dtype=np.int64) - np.repeat(firsts, sizes)
        base = np.array([offs[c] for c in cid[firsts]], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": did,
                "cell_id": cid,
                "pos": np.repeat(base, sizes) + local + 1,
            }
        )

    parted = cells.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(rank_part, batch_format="pandas")


def q_transform_mercator(sf_dir: str):
    """EPSG:4326 -> 3857 transform (golden-fixture oracle: log/tan are not
    bit-stable across numpy's SIMD kernels and DuckDB's libm)."""
    from incubator_sedona_ray.functions.transform import st_transform_batch

    out = _geo_docs(sf_dir).map_batches(
        st_transform_batch("EPSG:4326", "EPSG:3857", "lon", "lat"), batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "x", "y"])


def q_transform_national_grids(sf_dir: str):
    """Arbitrary-EPSG ST_Transform (golden-fixture oracle — Krueger/LCC/LAEA
    series and the Helmert ECEF round-trip have no DuckDB closed form).
    Geocoded doc points are squeezed into a Europe window, then projected
    to three national grids in one vectorized pass each: EPSG:27700
    (British National Grid — Airy ellipsoid + OSGB36 Helmert datum shift),
    EPSG:2154 (Lambert-93, LCC 2SP on GRS80) and EPSG:3035 (ETRS89-LAEA).
    Reference parity: ST_Transform accepts any EPSG via GeoTools
    (common/.../Functions.java:184-212)."""
    from incubator_sedona_ray.functions.transform import transform_xy

    def stage(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        # deterministic squeeze into a window valid for all three grids
        elon = -6.0 + (lon + 180.0) / 360.0 * 14.0  # [-6, 8]
        elat = 42.0 + (lat + 90.0) / 180.0 * 16.0  # [42, 58]
        cols = {"doc_id": batch["doc_id"]}
        for name, code in (("osgb", "EPSG:27700"), ("l93", "EPSG:2154"), ("laea", "EPSG:3035")):
            x, y = transform_xy("EPSG:4326", code, elon, elat)
            cols[f"{name}_x"] = pa.array(np.round(x, 6))
            cols[f"{name}_y"] = pa.array(np.round(y, 6))
        return pa.table(cols)

    return _geo_docs(sf_dir).map_batches(stage, batch_format="pyarrow")


def q_transform_world_grids(sf_dir: str):
    """Round-4 projection families through ST_Transform (golden-fixture
    oracle — no DuckDB closed form): oblique stereographic (EPSG:28992 RD
    New), Swiss oblique Mercator (EPSG:2056 LV95), Krovak (EPSG:5514),
    polar stereographic variant B (EPSG:3031), Lambert cylindrical equal
    area (EPSG:6933 EASE-Grid 2.0) and NZTM (EPSG:2193). Each family gets
    the geocoded doc points squeezed into its own valid window, then one
    vectorized pass. Reference parity: ST_Transform accepts any EPSG via
    GeoTools (common/.../Functions.java:184-212)."""
    from incubator_sedona_ray.functions.transform import transform_xy

    # (name, code, lon window, lat window)
    grids = (
        ("rd", "EPSG:28992", (3.5, 7.0), (50.8, 53.5)),
        ("lv95", "EPSG:2056", (6.0, 10.5), (45.9, 47.8)),
        ("krovak", "EPSG:5514", (12.2, 22.5), (47.8, 51.0)),
        ("aps", "EPSG:3031", (-180.0, 180.0), (-89.0, -61.0)),
        ("ease", "EPSG:6933", (-179.0, 179.0), (-84.0, 84.0)),
        ("nztm", "EPSG:2193", (166.5, 178.5), (-47.2, -34.4)),
    )

    def stage(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cols = {"doc_id": batch["doc_id"]}
        for name, code, (lo, hi), (la, lb) in grids:
            glon = lo + (lon + 180.0) / 360.0 * (hi - lo)
            glat = la + (lat + 90.0) / 180.0 * (lb - la)
            x, y = transform_xy("EPSG:4326", code, glon, glat)
            cols[f"{name}_x"] = pa.array(np.round(x, 6))
            cols[f"{name}_y"] = pa.array(np.round(y, 6))
        return pa.table(cols)

    return _geo_docs(sf_dir).map_batches(stage, batch_format="pyarrow")


def q_union_aggr_zones(sf_dir: str):
    """ST_Union_Aggr of the (disjoint) zone squares per lon column
    (canonical part order -> deterministic WKB, golden-fixture oracle)."""
    from incubator_sedona_ray.functions.aggregates import union_aggr

    zones = ray.data.from_arrow(_zones_table())

    def add_col(batch: pa.Table) -> pa.Table:
        zid = batch["zone_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("col_idx", pa.array(zid // ZN_Y))

    cols = zones.map_batches(add_col, batch_format="pyarrow")
    out = union_aggr(cols, group_key="col_idx", canonical_order=True)

    def hex_wkb(batch: pa.Table) -> pa.Table:
        hx = [b.hex() for b in batch["geom"].to_pylist()]
        return pa.table({"col_idx": batch["col_idx"], "geom_hex": pa.array(hx, type=pa.string())})

    return out.map_batches(hex_wkb, batch_format="pyarrow")


def q_tile_render(sf_dir: str):
    """Heatmap tiles rendered to PNG bytes (viz pipeline end-to-end); the
    sha256 of each PNG pins the full render against the golden fixture."""
    import hashlib

    from incubator_sedona_ray.raster.viz import render_tiles

    hm = heatmap_counts(_geo_docs(sf_dir), WORLD, 128, 64, 4, 4)
    tiles = render_tiles(hm, 128, 64, 4, 4, blur_radius=1)

    def add_sha(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(p).hexdigest() for p in batch["png"].to_pylist()]
        return pa.table(
            {
                "tile_id": batch["tile_id"],
                "width": batch["width"],
                "height": batch["height"],
                "png_sha": pa.array(shas, type=pa.string()),
            }
        )

    return tiles.map_batches(add_sha, batch_format="pyarrow")


def q_heatmap_stitched(sf_dir: str):
    """Per-tile heatmap renders stitched into ONE global PNG
    (viz/.../utils/ImageStitcher.java parity; golden-fixture oracle pins
    the sha256 of the stitched image). Distributed tile decode, single
    assemble task whose output is exactly one image row."""
    import hashlib

    from incubator_sedona_ray.raster.viz import render_tiles, stitch_tiles

    hm = heatmap_counts(_geo_docs(sf_dir), WORLD, 128, 64, 4, 4)
    tiles = render_tiles(hm, 128, 64, 4, 4, blur_radius=1)
    img = stitch_tiles(tiles, 128, 64, 4, 4)

    def add_sha(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(p).hexdigest() for p in batch["png"].to_pylist()]
        return pa.table(
            {"width": batch["width"], "height": batch["height"], "png_sha": pa.array(shas, type=pa.string())}
        )

    return img.map_batches(add_sha, batch_format="pyarrow")


def q_zone_clip_area(sf_dir: str):
    """ST_Intersection (convex clip) of each zone square with a fixed box;
    exact closed-form areas give a bit-exact SQL oracle."""
    from incubator_sedona_ray.functions.st import st_intersection, st_area

    t = _zones_table()
    clip = _wkb.to_wkb(Geometry.box(-50.0, -50.0, 50.0, 50.0))
    inter = st_intersection(t["geom"], pa.array([clip] * t.num_rows, type=pa.binary()))
    areas = st_area(inter)
    df = pd.DataFrame({"zone_id": t["zone_id"].to_pylist(), "clip_area": areas.to_pylist()})
    return df[df.clip_area > 0].reset_index(drop=True)


def q_pip_join_cells(sf_dir: str):
    """The same PIP join via the S2 cell-id equi-join plan (reference's own
    documented S2 workflow) — third implementation against the same oracle."""
    from incubator_sedona_ray.join.cell_join import s2_cell_join

    zones = ray.data.from_arrow(_zones_table())
    joined = s2_cell_join(
        zones, _geo_docs(sf_dir), "covers", level=5, left_geom="geom", right_geom=("lon", "lat")
    )
    return _rename(joined.select_columns(["l_zone_id", "r_doc_id"]), {"l_zone_id": "zone_id", "r_doc_id": "doc_id"})


def q_zone_diff_area(sf_dir: str):
    """ST_Difference (piecewise boolean kernel) of each zone minus the clip
    box; closed-form SQL oracle (225 - clip area)."""
    from incubator_sedona_ray.functions.st import st_difference, st_area

    t = _zones_table()
    clip = _wkb.to_wkb(Geometry.box(-50.0, -50.0, 50.0, 50.0))
    diff = st_difference(t["geom"], pa.array([clip] * t.num_rows, type=pa.binary()))
    areas = st_area(diff)
    return pd.DataFrame({"zone_id": t["zone_id"].to_pylist(), "diff_area": areas.to_pylist()})


def q_zone_buffer_area(sf_dir: str):
    """ST_Buffer (round-join Minkowski buffer, ``geom/ops.py buffer``):
    dilate and erode each zone square by a per-zone radius. Closed forms:
    erosion (side-2r)^2, dilation side^2 + 4*side*r + 16 r^2 sin(pi/16)
    (inscribed-32-gon corners). The engine agrees to ~1e-12 relative
    (shoelace cancellation at |coord|~180), so both sides are compared as
    integers in 1e-4 area units."""
    from incubator_sedona_ray.functions.st import st_buffer, st_area

    t = _zones_table()
    zone_ids = np.asarray(t["zone_id"].to_pylist())
    radii = 0.5 + 0.5 * (zone_ids % 5).astype(np.float64)
    dil = np.empty(len(zone_ids))
    ero = np.empty(len(zone_ids))
    for r in np.unique(radii):
        m = radii == r
        sub = t["geom"].filter(pa.array(m))
        dil[m] = st_area(st_buffer(sub, float(r))).to_numpy(zero_copy_only=False)
        ero[m] = st_area(st_buffer(sub, -float(r))).to_numpy(zero_copy_only=False)
    # dilated area as an integer in 1e-4 units: float round() of the two
    # sides lands on different nearest-doubles; integers can't
    return pd.DataFrame(
        {
            "zone_id": zone_ids,
            "r": radii,
            "dil_area_e4": np.rint(dil * 10000.0).astype(np.int64),
            "ero_area_e4": np.rint(ero * 10000.0).astype(np.int64),
        }
    )


SLIDE_US = 6 * 3600 * 1_000_000   # 6h slide
WIN_US = 24 * 3600 * 1_000_000    # 24h window


def q_sliding_window(sf_dir: str):
    """Sliding-window count per event_type (24h window, 6h slide): each
    event explodes into the 4 windows containing it; count per
    (event_type, window_start)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def explode(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = WIN_US // SLIDE_US
        reps = np.full(len(us), k, dtype=np.int64)
        idx = np.repeat(np.arange(len(us)), reps)
        offs = np.tile(np.arange(k, dtype=np.int64), len(us))
        win_start = (us[idx] // SLIDE_US - offs) * SLIDE_US
        out = batch.take(pa.array(idx))
        return pa.table({"event_type": out["event_type"], "win_start": pa.array(win_start)})

    counts = ev.map_batches(explode, batch_format="pyarrow").groupby(["event_type", "win_start"]).count()
    return _rename(counts, {"count()": "n"})


def q_asof_join(sf_dir: str):
    """As-of join: for each click, the latest prior error of the same user
    (left-outer; unmatched -> -1). DuckDB native ASOF JOIN is the oracle."""
    from incubator_sedona_ray.join.asof import asof_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"])

    def split(kind):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pa.compute.equal(batch["event_type"], kind))
            return t.drop_columns(["event_type"])

        return fn

    clicks = ev.map_batches(split("click"), batch_format="pyarrow")
    errors = ev.map_batches(split("error"), batch_format="pyarrow")
    out = asof_join(clicks, errors, by="user_id", on="ts", right_prefix="err_")

    def shape(batch: pa.Table) -> pa.Table:
        err = batch["err_event_id"].to_pandas().fillna(-1).astype("int64")
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "err_id": pa.array(err, type=pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow")


def q_bloom_dedup(sf_dir: str):
    """Bloom-prefiltered EXACT anti-join (sketch/bloom.py): drop documents
    whose text already exists in the "seen" snapshot (docs with
    doc_id % 3 == 0). Bloom misses stream through with ZERO shuffles; only
    the hit tail (true overlap + ~FPR) takes the verify left-anti join, so
    the exchange is sized by the overlap, not the corpus."""
    from incubator_sedona_ray.sketch.bloom import bloom_anti_join

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang", "source"])

    def _seen(b: pa.Table) -> pa.Table:
        m = b["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0
        return b.filter(pa.array(m))

    seen = docs.map_batches(_seen, batch_format="pyarrow").select_columns(["text"])
    out = bloom_anti_join(docs, seen, col="text", num_bits=1 << 20)
    return out.select_columns(["doc_id", "lang", "source"])


def q_cms_heavy_tokens(sf_dir: str):
    """Count-Min-pruned EXACT heavy hitters (sketch/cms.py): tokens whose
    corpus-wide count >= max(5, n_docs/50). The CMS (one mergeable 8 MiB
    matrix) filters the pre-combined pair stream so only candidates — a
    provable superset of the answer — enter the exact groupby."""
    from incubator_sedona_ray.sketch.cms import heavy_hitters_exact

    docs = _docs(sf_dir, columns=["text"])
    thr = max(5, docs.count() // 50)
    return heavy_hitters_exact(docs, threshold=thr, n=1)


def _synth_scaled_dups_fn(b: pa.Table) -> pa.Table:
    """Append a 2x-scaled copy (vec_id + 10^9) of every vec_id % 5 == 0
    embedding: an exact semantic duplicate (cosine is scale-invariant,
    cos(v, 2v) = 1) with zero float-boundary risk against tau. The 10^9
    offset keeps synthesized ids disjoint from base vec_ids at any sf."""
    m = b["vec_id"].to_numpy(zero_copy_only=False) % 5 == 0
    sub = b.filter(pa.array(m))
    emb = [[2.0 * x for x in row] for row in sub["embedding"].to_pylist()]
    extra = pa.table(
        {
            "vec_id": pa.array(sub["vec_id"].to_numpy(zero_copy_only=False) + 1_000_000_000),
            "embedding": pa.array(emb, type=b.schema.field("embedding").type),
            "label": sub["label"],
        }
    )
    return pa.concat_tables([b.select(["vec_id", "embedding", "label"]), extra])


def q_semdedup(sf_dir: str):
    """SemDeDup (dedup/semdedup.py, Abbas et al. 2023): assign embeddings
    to the nearest of the k=8 lowest-id seed embeddings, then inside each
    cluster drop rows with cosine >= 0.8 to a lower-id row. Input = the
    embeddings table + synthesized 2x-scaled duplicates; the survivors are
    exactly the original rows (every planted dup shares its source's
    cluster and sits at cosine 1)."""
    from incubator_sedona_ray.dedup.semdedup import semdedup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").map_batches(
        _synth_scaled_dups_fn, batch_format="pyarrow"
    )
    return semdedup(emb, id_col="vec_id", vec_col="embedding", k=8, tau=0.8)


def q_hashed_tfidf(sf_dir: str):
    """Hashed TF-IDF sparse document vectors (text/tfidf.py): exact
    integer fixed-point idf = (N*scale)//df, sha256 bucket hashing, one
    vocabulary-bounded df shuffle + a zero-shuffle broadcast score pass.
    Output: (doc_id, bucket, weight) sparse rows."""
    from incubator_sedona_ray.text.tfidf import hashed_tfidf

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return hashed_tfidf(docs, dim=1 << 18, scale=10**6)


BLOCKLIST_TERMS = ["spark", "window", "slow merge"]


def q_blocklist(sf_dir: str):
    """Blocklist flagging (text/blocklist.py): docs containing any blocked
    term (case-insensitive substring), with the count of distinct terms
    matched. One RE2-alternation sweep prefilters; per-term counts run
    only on flagged rows."""
    from incubator_sedona_ray.text.blocklist import blocklist_flags

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return blocklist_flags(docs, BLOCKLIST_TERMS)


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke: runs, >=0 rows, stable schema)."""
    return q_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "geocode": q_geocode,
        "grid_cells": q_grid_cells,
        "range_query": q_range_query,
        "pip_join": q_pip_join,
        "pip_join_gc": q_pip_join_gc,
        "pip_join_broadcast": q_pip_join_broadcast,
        "poly_join": q_poly_join,
        "pip_join_salted": q_pip_join_salted,
        "pip_join_cells": q_pip_join_cells,
        "pip_join_count": q_pip_join_count,
        "distance_join": q_distance_join,
        "knn_join": q_knn_join,
        "knn_join_partitioned": q_knn_join_partitioned,
        "knn_query": q_knn_query,
        "tile_assign": q_tile_assign,
        "zonal_tile_stats": q_zonal_tile_stats,
        "envelope_aggr": q_envelope_aggr,
        "heatmap": q_heatmap,
        "heatmap_weighted": q_heatmap_weighted,
        "st_zone_stats": q_st_zone_stats,
        "st_accessors": q_st_accessors,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "bpe_token_count": q_bpe_token_count,
        "quality": q_quality,
        "lang_count": q_lang_count,
        "pii_redact": q_pii_redact,
        "repetition": q_repetition,
        "paragraph_dedup": q_paragraph_dedup,
        "lm_familiarity": q_lm_familiarity,
        "lm_backoff": q_lm_backoff,
        "lm_backoff_join": q_lm_backoff_join,
        "decontam": q_decontam,
        "dup_spans": q_dup_spans,
        "dup_span_removal": q_dup_span_removal,
        "extract_links": q_extract_links,
        "anchor_stats": q_anchor_stats,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "pagerank_personalized": q_pagerank_personalized,
        "pack_offsets": q_pack_offsets,
        "bfs_hops": q_bfs_hops,
        "mixture_sample": q_mixture_sample,
        "ip_geo_join": q_ip_geo_join,
        "degree_hist": q_degree_hist,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "text_normalize": q_text_normalize,
        "extract_title": q_extract_title,
        "warc_roundtrip": q_warc_roundtrip,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "linreg_quality": q_linreg_quality,
        "link_components": q_link_components,
        "link_components_bsp": q_link_components_bsp,
        "centroid_per_label": q_centroid_per_label,
        "url_dedup": q_url_dedup,
        "html_extract": q_html_extract,
        "bm25_topk": q_bm25_topk,
        "stratified_sample": q_stratified_sample,
        "seq_chunks": q_seq_chunks,
        "sliding_chunks": q_sliding_chunks,
        "compression_ratio": q_compression_ratio,
        "domain_stats": q_domain_stats,
        "corpus_filter": q_corpus_filter,
        "tpch_q1": q_tpch_q1,
        "tpch_q4": q_tpch_q4,
        "tpch_q6": q_tpch_q6,
        "tpch_q10": q_tpch_q10,
        "tpch_q3": q_tpch_q3,
        "image_dedup": q_image_dedup,
        "top_docs_per_lang": q_top_docs_per_lang,
        "dedup_incremental": q_dedup_incremental,
        "reservoir_sample": q_reservoir_sample,
        "reservoir_per_lang": q_reservoir_per_lang,
        "doclen_quantiles": q_doclen_quantiles,
        "lang_length_quantiles": q_lang_length_quantiles,
        "top_bigrams": q_top_bigrams,
        "postings_lookup": q_postings_lookup,
        "collocations": q_collocations,
        "collocations_join": q_collocations_join,
        "tpch_q14": q_tpch_q14,
        "script_mix": q_script_mix,
        "lang_moments": q_lang_moments,
        "lang_distinct_sources": q_lang_distinct_sources,
        "length_band_filter": q_length_band_filter,
        "hll_domains": q_hll_domains,
        "tpch_q5": q_tpch_q5,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_q22": q_tpch_q22,
        "tpch_q2": q_tpch_q2,
        "dsir_select": q_dsir_select,
        "dsir_select_join": q_dsir_select_join,
        "bloom_dedup": q_bloom_dedup,
        "cms_heavy_tokens": q_cms_heavy_tokens,
        "semdedup": q_semdedup,
        "blocklist": q_blocklist,
        "hashed_tfidf": q_hashed_tfidf,
        "ann_topk": q_ann_topk,
        "embed_dup_pairs": q_embed_dup_pairs,
        "window_agg": q_window_agg,
        "sessionize": q_sessionize,
        "top_users": q_top_users,
        "multimodal_meta": q_multimodal_meta,
        "frame_sample": q_frame_sample,
        "frame_sample_mjpeg": q_frame_sample_mjpeg,
        "image_resize": q_image_resize,
        "audio_features": q_audio_features,
        "audio_features_wav": q_audio_features_wav,
        "spatial_sort": q_spatial_sort,
        "zone_clip_area": q_zone_clip_area,
        "zone_diff_area": q_zone_diff_area,
        "zone_buffer_area": q_zone_buffer_area,
        "sliding_window": q_sliding_window,
        "asof_join": q_asof_join,
        # rows-only checks (non-SQL-expressible)
        "transform_mercator": q_transform_mercator,
        "transform_national_grids": q_transform_national_grids,
        "transform_world_grids": q_transform_world_grids,
        "union_aggr_zones": q_union_aggr_zones,
        "tile_render": q_tile_render,
        "heatmap_stitched": q_heatmap_stitched,
        "s2_cells": q_s2_cells,
        "geohash": q_geohash,
        "h3_cells": q_h3_cells,
        "langid": q_langid,
        "minhash_survivors": q_minhash_survivors,
        "jaccard_pairs": q_jaccard_pairs,
        "jaccard_pairs_ids": q_jaccard_pairs_ids,
        "choropleth": q_choropleth,
        "scatter_zones": q_scatter_zones,
        "simhash": q_simhash,
        "fingerprint": q_fingerprint,
        "ann_topk_lsh": q_ann_topk_lsh,
        "kmeans_clusters": q_kmeans_clusters,
        "ann_topk_pq": q_ann_topk_pq,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_ivf_pruned": q_ann_topk_ivf_pruned,
        "diversity_sample": q_diversity_sample,
        "flagship_pages": q_flagship,
        "image_decode_fake": q_image_decode_fake,
        "image_decode_png": q_image_decode_png,
        "image_decode_jpeg": q_image_decode_jpeg,
    }


def _geohash_sql(precision: int) -> str:
    """Pure-SQL base-32 geohash matching encoders/geohash.py bit-for-bit:
    floor-quantize each axis to its bit budget, interleave (even global bit
    positions take lon), then base-32 chars from 5-bit groups."""
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    parts = []
    for b in range(nbits):
        if b % 2 == 0:
            parts.append(f"(((li >> {lon_bits - 1 - b // 2}) & 1) << {nbits - 1 - b})")
        else:
            parts.append(f"(((la >> {lat_bits - 1 - (b - 1) // 2}) & 1) << {nbits - 1 - b})")
    combined = " | ".join(parts)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> {5 * (precision - 1 - c)}) & 31) AS INT) + 1, 1)"
        for c in range(precision)
    )
    return (
        f"WITH pts AS ({_PTS_SQL}), q AS (SELECT doc_id, "
        f"least(greatest(CAST(trunc((lon + 180.0) / 360.0 * {1 << lon_bits}) AS BIGINT), 0), {(1 << lon_bits) - 1}) AS li, "
        f"least(greatest(CAST(trunc((lat + 90.0) / 180.0 * {1 << lat_bits}) AS BIGINT), 0), {(1 << lat_bits) - 1}) AS la "
        f"FROM pts), g AS (SELECT doc_id, {combined} AS gh FROM q) "
        f"SELECT doc_id, {chars} AS geohash FROM g"
    )


# Golden-fixture oracles (generated ONCE by scripts/gen_oracle_fixtures.py
# from the tested encoders at sf0.01, committed): for operators with no
# closed-form SQL (Hilbert-curve S2, H3-lite, the langid model, simhash /
# fingerprint bit mixing, seeded minhash). They pin exact values against
# regressions; the driver compares them like any other oracle.
_FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "oracle_sf0.01")
_FIXTURE_ORACLES = [
    "bpe_merges",
    "compression_ratio",
    "bpe_encode",
    "s2_cells",
    "h3_cells",
    "langid",
    "simhash",
    "fingerprint",
    "minhash_survivors",
    "ann_topk_lsh",
    "kmeans_clusters",
    "ann_topk_pq",
    "ann_topk_ivf",
    "transform_mercator",
    "transform_national_grids",
    "transform_world_grids",
    "union_aggr_zones",
    "tile_render",
    "heatmap_stitched",
    "image_decode_png",
    "image_decode_jpeg",
    "frame_sample_mjpeg",
    "image_resize",
    "image_dedup",
    "hll_domains",
]


def _mix_h() -> str:
    from incubator_sedona_ray.dedup.sample import fmix32_sql

    return fmix32_sql("doc_id", seed=MIX_SEED)


def _reservoir_h() -> str:
    """fmix32 priority expression shared by the reservoir-sample oracles."""
    from incubator_sedona_ray.dedup.sample import fmix32_sql

    return fmix32_sql("doc_id", seed=RESERVOIR_SEED)


def _stratified_sample_sql() -> str:
    """fmix32 replayed in SQL: keep iff hash/2^32 < rate[lang]."""
    from incubator_sedona_ray.dedup.sample import fmix32_sql

    rate_case = " ".join(f"WHEN '{s}' THEN {r!r}" for s, r in sorted(SAMPLE_RATES.items()))
    h = fmix32_sql("doc_id", seed=SAMPLE_SEED)
    return (
        f"SELECT doc_id, lang FROM documents "
        f"WHERE CAST({h} AS DOUBLE)/4294967296.0 < (CASE lang {rate_case} ELSE {SAMPLE_DEFAULT!r} END)"
    )


def _pagerank_sql() -> str:
    """The fixed-point PageRank recurrence unrolled iteration-by-iteration:
    every arithmetic step is BIGINT-only (// division, order-independent
    integer sums), so the comparison with the distributed engine is
    bit-exact, not tolerance-based. Mirrors graph/pagerank.py exactly:
    base + (85 * (contrib + dangling // n)) // 100 at picorank scale."""
    S = PAGERANK_SCALE
    cnt = "(SELECT cnt FROM n)"
    base = f"(15 * ({S} // {cnt})) // 100"
    ctes = [
        "n AS (SELECT count(*) AS cnt FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        f"edges AS (SELECT doc_id AS src, (doc_id * 7 + j * 13) % {cnt} AS dst "
        "FROM documents, UNNEST([1, 2, 3]) AS t(j) WHERE doc_id % 11 <> 0)",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "nd AS (SELECT node, coalesce(d, 0) AS d FROM nodes LEFT JOIN deg ON node = src)",
        f"r0 AS (SELECT node, d, {S} // {cnt} AS r FROM nd)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"dg{i} AS (SELECT coalesce(sum(r), 0) AS dang FROM {p} WHERE d = 0)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, sum(p.r // p.d) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.node GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT nd.node, nd.d, {base} + "
            f"(85 * (coalesce(c{i}.s, 0) + (SELECT dang FROM dg{i}) // {cnt})) // 100 AS r "
            f"FROM nd LEFT JOIN c{i} ON nd.node = c{i}.node)"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_fp, "
        f"CAST(r AS DOUBLE) / CAST({S} AS DOUBLE) AS rank FROM r{PAGERANK_ITERS}"
    )


def _hits_sql() -> str:
    """The fixed-point HITS recurrence unrolled half-round by half-round:
    BIGINT-only sums and floor divisions (the renormalization divisor is
    greatest(sum // scale, 1)), so the comparison with the distributed
    engine is bit-exact. Mirrors graph/hits.py exactly."""
    S = HITS_SCALE
    cnt = "(SELECT cnt FROM n)"
    ctes = [
        "n AS (SELECT count(*) AS cnt FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        f"edges AS (SELECT doc_id AS src, (doc_id * 7 + j * 13) % {cnt} AS dst "
        "FROM documents, UNNEST([1, 2, 3]) AS t(j) WHERE doc_id % 11 <> 0)",
        f"h0 AS (SELECT node, CAST({S} AS BIGINT) AS v FROM nodes)",
    ]
    for i in range(1, HITS_ITERS + 1):
        ctes.append(
            f"araw{i} AS (SELECT e.dst AS node, sum(p.v) AS s "
            f"FROM edges e JOIN h{i - 1} p ON e.src = p.node GROUP BY e.dst)"
        )
        ctes.append(
            f"da{i} AS (SELECT greatest(coalesce(sum(s), 0) // {S}, 1) AS d FROM araw{i})"
        )
        ctes.append(
            f"a{i} AS (SELECT nodes.node, coalesce(ar.s, 0) // (SELECT d FROM da{i}) AS v "
            f"FROM nodes LEFT JOIN araw{i} ar ON nodes.node = ar.node)"
        )
        ctes.append(
            f"hraw{i} AS (SELECT e.src AS node, sum(q.v) AS s "
            f"FROM edges e JOIN a{i} q ON e.dst = q.node GROUP BY e.src)"
        )
        ctes.append(
            f"dh{i} AS (SELECT greatest(coalesce(sum(s), 0) // {S}, 1) AS d FROM hraw{i})"
        )
        ctes.append(
            f"h{i} AS (SELECT nodes.node, coalesce(hr.s, 0) // (SELECT d FROM dh{i}) AS v "
            f"FROM nodes LEFT JOIN hraw{i} hr ON nodes.node = hr.node)"
        )
    k = HITS_ITERS
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT h{k}.node AS doc_id, CAST(h{k}.v AS BIGINT) AS hub_fp, "
        f"CAST(a{k}.v AS BIGINT) AS auth_fp, "
        f"CAST(h{k}.v AS DOUBLE) / {float(S)} AS hub, "
        f"CAST(a{k}.v AS DOUBLE) / {float(S)} AS authority "
        f"FROM h{k} JOIN a{k} ON h{k}.node = a{k}.node"
    )


def _ppr_sql() -> str:
    """Personalized-PageRank oracle: the fixed-point recurrence unrolled
    with the teleport vector uniform over seeds (doc_id%97==0) — seeds
    carry the base mass and the dangling redistribution; non-seeds get
    (85 * contrib) // 100 only. BIGINT-exact like _pagerank_sql."""
    S = PAGERANK_SCALE
    cnt = "(SELECT cnt FROM sc)"
    base = f"(15 * ({S} // {cnt})) // 100"
    ctes = [
        "n AS (SELECT count(*) AS cnt FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        "sc AS (SELECT count(*) AS cnt FROM documents WHERE doc_id % 97 = 0)",
        f"edges AS (SELECT doc_id AS src, (doc_id * 7 + j * 13) % (SELECT cnt FROM n) AS dst "
        "FROM documents, UNNEST([1, 2, 3]) AS t(j) WHERE doc_id % 11 <> 0)",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "nd AS (SELECT node, coalesce(d, 0) AS d, CASE WHEN node % 97 = 0 THEN 1 ELSE 0 END AS sd "
        "FROM nodes LEFT JOIN deg ON node = src)",
        f"r0 AS (SELECT node, d, sd, CASE WHEN sd = 1 THEN {S} // {cnt} ELSE 0 END AS r FROM nd)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"dg{i} AS (SELECT coalesce(sum(r), 0) AS dang FROM {p} WHERE d = 0)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, sum(p.r // p.d) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.node GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT nd.node, nd.d, nd.sd, "
            f"CASE WHEN nd.sd = 1 THEN {base} ELSE 0 END + "
            f"(85 * (coalesce(c{i}.s, 0) + CASE WHEN nd.sd = 1 THEN (SELECT dang FROM dg{i}) // {cnt} ELSE 0 END)) // 100 AS r "
            f"FROM nd LEFT JOIN c{i} ON nd.node = c{i}.node)"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_fp, "
        f"CAST(r AS DOUBLE) / CAST({S} AS DOUBLE) AS rank FROM r{PAGERANK_ITERS}"
    )


def _bm25_sql() -> str:
    """Closed-form BM25 oracle: identical tokenization (lower, \\s+ split,
    empties dropped), identical float64 evaluation order (left-to-right
    term sum, ln(1 + (N-df+.5)/(df+.5)) idf), ties by doc_id. Returns
    (doc_id, rank) — engine scores are bit-close but ranks exact."""
    k1, b = BM25_K1, BM25_B
    tf_cols = ", ".join(
        f"len(list_filter(ws, x -> x = '{t}')) AS tf{j}" for j, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(f"count_if(tf{j} > 0) AS df{j}" for j in range(len(BM25_TERMS)))
    score = " + ".join(
        f"ln(1 + (n - df{j} + 0.5)/(df{j} + 0.5)) * (tf{j}*({k1}+1))/(tf{j} + {k1}*(1-{b}+{b}*dl/avgdl))"
        for j in range(len(BM25_TERMS))
    )
    return (
        "WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws FROM documents), "
        "d AS (SELECT doc_id, ws, len(ws) AS dl FROM w), "
        "stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM d), "
        f"tf AS (SELECT doc_id, dl, {tf_cols} FROM d), "
        f"dfs AS (SELECT {df_cols} FROM tf), "
        f"sc AS (SELECT doc_id, {score} AS score FROM tf, stats, dfs) "
        "SELECT doc_id, rank FROM (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank "
        f"FROM sc WHERE score > 0) WHERE rank <= {BM25_K}"
    )


def _flagship_sql() -> str | None:
    """Hybrid oracle for the flagship pipeline: url synthesis, the
    sha256-hex -> bbox geocoder, the point-in-bbox zone LEFT JOIN and the
    pixel->tile formula are all closed-form SQL; only the level-10 S2
    Hilbert cell comes from the golden fixture (joined on doc_id).
    DuckDB's `CAST('0x..' AS BIGINT)` parses the same big-endian u32 the
    engine takes from `sha256(domain)` bytes 0-4 / 4-8
    (text/geocode.py _host_point)."""
    from incubator_sedona_ray.pipelines.pages import _LANG_TLDS
    from incubator_sedona_ray.text.geocode import CC_BBOX, GLOBAL_BBOX

    s2_path = os.path.join(_FIXTURE_DIR, "flagship_s2.parquet")
    if not os.path.exists(s2_path):
        return None
    # literals must be DOUBLE: bare 6.0 in VALUES is DECIMAL, and DECIMAL
    # subtraction (exact) rounds differently from the engine's float64 ops
    boxes = ", ".join(
        f"('{cc}', CAST({x0!r} AS DOUBLE), CAST({y0!r} AS DOUBLE), CAST({x1!r} AS DOUBLE), CAST({y1!r} AS DOUBLE))"
        for cc, (x0, y0, x1, y1) in sorted(CC_BBOX.items())
    )
    tld_case = " ".join(
        "WHEN '{lang}' THEN list_extract([{lst}], CAST(doc_id % {n} AS INT) + 1)".format(
            lang=lang, lst=", ".join(f"'{t}'" for t in tlds), n=len(tlds)
        )
        for lang, tlds in _LANG_TLDS.items()
    )
    gx0, gy0, gx1, gy1 = GLOBAL_BBOX
    px_sql = f"CAST(floor((lon + 180.0) / 360.0 * {TILE_RES_X}) AS BIGINT)"
    py_sql = f"CAST(floor((lat + 90.0) / 180.0 * {TILE_RES_Y}) AS BIGINT)"
    tile_sql = (
        f"(({px_sql} // {TILE_RES_X // TILE_PX}) + "
        f"({TILE_PY - 1} - ({py_sql} // {TILE_RES_Y // TILE_PY})) * {TILE_PX})"
    )
    return (
        f"WITH cc_box(cc, bx0, by0, bx1, by1) AS (VALUES {boxes}), "
        f"t AS (SELECT doc_id, lang, source, CASE lang {tld_case} ELSE 'com' END AS tld FROM documents), "
        f"u AS (SELECT doc_id, lang, tld, source || '-' || CAST(doc_id AS VARCHAR) || '.' || tld AS dom FROM t), "
        f"f AS (SELECT doc_id, lang, tld, 'https://' || dom || '/p/' || CAST(doc_id AS VARCHAR) AS url, "
        f"CAST(CAST('0x' || substr(sha256(dom), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS fx, "
        f"CAST(CAST('0x' || substr(sha256(dom), 9, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS fy FROM u), "
        f"g AS (SELECT doc_id, url, lang, "
        f"coalesce(b.bx0, {gx0}) + fx * (coalesce(b.bx1, {gx1}) - coalesce(b.bx0, {gx0})) AS lon, "
        f"coalesce(b.by0, {gy0}) + fy * (coalesce(b.by1, {gy1}) - coalesce(b.by0, {gy0})) AS lat "
        f"FROM f LEFT JOIN cc_box b ON b.cc = f.tld) "
        f"SELECT g.url AS url, g.lang AS lang, g.lon AS lon, g.lat AS lat, "
        f"s2.s2_cell AS s2_cell, z.cc AS zone_zone_cc, {tile_sql} AS tile_id "
        f"FROM g JOIN read_parquet('{s2_path}') s2 ON s2.doc_id = g.doc_id "
        f"LEFT JOIN cc_box z ON g.lon >= z.bx0 AND g.lon <= z.bx1 AND g.lat >= z.by0 AND g.lat <= z.by1"
    )


def oracle_sql() -> dict[str, str]:
    px_sql = f"CAST(floor((lon + 180.0) / 360.0 * {TILE_RES_X}) AS BIGINT)"
    py_sql = f"CAST(floor((lat + 90.0) / 180.0 * {TILE_RES_Y}) AS BIGINT)"
    # the clamp rules of FindOnePixelCoordinate never fire for this lattice
    # (lon in [-180, 179.99], lat in [-90, 89.99]) — see raster/tile.py
    tile_sql = (
        f"(({px_sql} // {TILE_RES_X // TILE_PX}) + "
        f"({TILE_PY - 1} - ({py_sql} // {TILE_RES_Y // TILE_PY})) * {TILE_PX})"
    )
    hm_px = f"CAST(floor((lon + 180.0) / 360.0 * {HM_RES_X}) AS BIGINT)"
    hm_py = f"CAST(floor((lat + 90.0) / 180.0 * {HM_RES_Y}) AS BIGINT)"
    dsq = "((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat))"
    from incubator_sedona_ray.pipelines.pages import _LANG_TLDS
    from incubator_sedona_ray.text.redact import EMAIL_RE, IPV4_RE, PHONE_RE
    from incubator_sedona_ray.text.urls import _HEAD_RE

    pii_suffix = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.0.' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 555 000' || CAST(doc_id % 10 AS VARCHAR)"
    )
    url_tld_case = " ".join(
        "WHEN '{lang}' THEN list_extract([{lst}], CAST(doc_id % {n} AS INT) + 1)".format(
            lang=lang, lst=", ".join(f"'{t}'" for t in tlds), n=len(tlds)
        )
        for lang, tlds in _LANG_TLDS.items()
    )
    out = {
        "geocode": f"SELECT doc_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents",
        "grid_cells": (
            f"WITH pts AS ({_PTS_SQL}) "
            f"SELECT doc_id, {_grid.sql_expr('lon', 'lat', GRID_LEVEL)} AS cell_id FROM pts"
        ),
        "range_query": (
            f"WITH pts AS ({_PTS_SQL}) SELECT doc_id, lon, lat FROM pts "
            f"WHERE lon >= {RANGE_BOX[0]} AND lon <= {RANGE_BOX[2]} "
            f"AND lat >= {RANGE_BOX[1]} AND lat <= {RANGE_BOX[3]}"
        ),
        "pip_join": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}) "
            f"SELECT z.zone_id AS zone_id, p.doc_id AS doc_id FROM zones z JOIN pts p ON "
            f"p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE}"
        ),
        "pip_join_broadcast": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}) "
            f"SELECT z.zone_id AS zone_id, p.doc_id AS doc_id FROM zones z JOIN pts p ON "
            f"p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE}"
        ),
        "pip_join_gc": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}) "
            f"SELECT z.zone_id AS zone_id, p.doc_id AS doc_id FROM zones z JOIN pts p ON "
            f"(p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE / 2.0} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE / 2.0}) "
            f"OR (p.lon >= z.x0 + {ZN_SIDE / 2.0} AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 + {ZN_SIDE / 2.0} AND p.lat <= z.y0 + {ZN_SIDE})"
        ),
        "poly_join": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}), "
            "b AS (SELECT doc_id, lon, lat, 0.5 + 0.5 * (doc_id % 4) AS w FROM pts) "
            f"SELECT z.zone_id AS zone_id, b.doc_id AS doc_id FROM zones z JOIN b ON "
            f"b.lon - b.w <= z.x0 + {ZN_SIDE} AND b.lon + b.w >= z.x0 "
            f"AND b.lat - b.w <= z.y0 + {ZN_SIDE} AND b.lat + b.w >= z.y0"
        ),
        "pip_join_salted": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}) "
            f"SELECT z.zone_id AS zone_id, p.doc_id AS doc_id FROM zones z JOIN pts p ON "
            f"p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE}"
        ),
        "pip_join_cells": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}) "
            f"SELECT z.zone_id AS zone_id, p.doc_id AS doc_id FROM zones z JOIN pts p ON "
            f"p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE}"
        ),
        "pip_join_count": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}) "
            f"SELECT z.zone_id AS zone_id, COUNT(*) AS n_docs FROM zones z JOIN pts p ON "
            f"p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE} "
            f"GROUP BY z.zone_id"
        ),
        "distance_join": (
            f"WITH pts AS ({_PTS_SQL}) "
            f"SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM pts a, pts b "
            f"WHERE a.doc_id % {DIST_MOD} = 0 AND b.doc_id % {DIST_MOD} = 0 "
            f"AND a.doc_id < b.doc_id AND sqrt({dsq}) <= {DIST_RADIUS}"
        ),
        "knn_join": (
            f"WITH pts AS ({_PTS_SQL}), q(query_id, qx, qy) AS (VALUES "
            + ", ".join(f"({i}, {x}, {y})" for i, x, y in KNN_QUERIES)
            + "), d AS (SELECT q.query_id, p.doc_id, "
            "((p.lon - q.qx) * (p.lon - q.qx) + (p.lat - q.qy) * (p.lat - q.qy)) AS d2 "
            "FROM q, pts p) "
            "SELECT query_id, doc_id, rank FROM ("
            "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY d2, doc_id) AS rank FROM d"
            f") WHERE rank <= {KNN_K}"
        ),
        "knn_join_partitioned": (
            f"WITH pts AS ({_PTS_SQL}), q(query_id, qx, qy) AS (VALUES "
            + ", ".join(f"({i}, {x}, {y})" for i, x, y in KNN_QUERIES)
            + "), d AS (SELECT q.query_id, p.doc_id, "
            "((p.lon - q.qx) * (p.lon - q.qx) + (p.lat - q.qy) * (p.lat - q.qy)) AS d2 "
            "FROM q, pts p) "
            "SELECT query_id, doc_id, rank FROM ("
            "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY d2, doc_id) AS rank FROM d"
            f") WHERE rank <= {KNN_K}"
        ),
        "knn_query": (
            f"WITH pts AS ({_PTS_SQL}), d AS (SELECT doc_id, (lon * lon + lat * lat) AS d2 FROM pts) "
            "SELECT doc_id, rank FROM ("
            "SELECT doc_id, row_number() OVER (ORDER BY d2, doc_id) AS rank FROM d) WHERE rank <= 10"
        ),
        "tile_assign": (
            f"WITH pts AS ({_PTS_SQL}) "
            f"SELECT doc_id, {px_sql} AS pixel_x, {py_sql} AS pixel_y, {tile_sql} AS tile_id FROM pts"
        ),
        "zonal_tile_stats": (
            f"WITH pts AS (SELECT doc_id, n_chars, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents) "
            f"SELECT {tile_sql} AS tile_id, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            f"FROM pts GROUP BY 1"
        ),
        "envelope_aggr": (
            f"WITH pts AS ({_PTS_SQL}) SELECT MIN(lon) AS min_lon, MIN(lat) AS min_lat, "
            f"MAX(lon) AS max_lon, MAX(lat) AS max_lat FROM pts"
        ),
        "heatmap": (
            f"WITH pts AS ({_PTS_SQL}) "
            f"SELECT ({hm_px} + {hm_py} * {HM_RES_X}) AS pixel_id, COUNT(*) AS weight FROM pts GROUP BY 1"
        ),
        "heatmap_weighted": (
            f"WITH pts AS ({_PTS_SQL}) "
            f"SELECT ({hm_px} + {hm_py} * {HM_RES_X}) AS pixel_id, "
            f"CAST(SUM(doc_id % 7 + 1) AS BIGINT) AS weight FROM pts GROUP BY 1"
        ),
        "st_accessors": (
            f"WITH zones AS ({_ZONES_SQL}) SELECT zone_id, x0 AS sx, y0 AS sy, "
            f"x0 + {ZN_SIDE} AS p3x, y0 + {ZN_SIDE} AS p3y, "
            "CAST(5 AS BIGINT) AS n_points, CAST(1 AS BIGINT) AS n_rings, "
            "CAST(0 AS BIGINT) AS n_holes, CAST(2 AS BIGINT) AS dim, "
            f"sqrt(({ZN_SIDE}/2)*({ZN_SIDE}/2) + ({ZN_SIDE}/2)*({ZN_SIDE}/2)) AS mbr_radius FROM zones"
        ),
        "st_zone_stats": (
            f"WITH zones AS ({_ZONES_SQL}) SELECT zone_id, {ZN_SIDE} * {ZN_SIDE} AS area, "
            f"4 * {ZN_SIDE} AS perimeter, x0 + {ZN_SIDE} / 2 AS cx, y0 + {ZN_SIDE} / 2 AS cy FROM zones"
        ),
        "dedup_exact": (
            "SELECT MIN(doc_id) AS doc_id, sha256(text) AS text_hash FROM documents GROUP BY sha256(text)"
        ),
        "token_count": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens FROM documents"
        ),
        "bpe_token_count": (
            r"SELECT doc_id, len(regexp_extract_all(text, "
            r"'[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]')) AS n_bpe_tokens FROM documents"
        ),
        "quality": (
            "WITH q AS (SELECT doc_id, length(text) AS n_chars_q, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha, "
            "length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits, "
            "length(text) - length(replace(text, ' ', '')) AS n_spaces FROM documents) "
            "SELECT doc_id, n_chars_q, n_alpha, n_digits, n_spaces, "
            "CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars_q, 1) AS DOUBLE) AS alpha_ratio FROM q"
        ),
        "lang_count": "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang",
        "pii_redact": (
            # counts taken on the RUNNING text in rule order, exactly as
            # text/redact.py redact_batch does (email -> ip -> phone)
            f"WITH t0 AS (SELECT doc_id, {pii_suffix} AS t FROM documents), "
            f"t1 AS (SELECT doc_id, len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_email, "
            f"regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t FROM t0), "
            f"t2 AS (SELECT doc_id, n_email, len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ip, "
            f"regexp_replace(t, '{IPV4_RE}', '<IP>', 'g') AS t FROM t1), "
            f"t3 AS (SELECT doc_id, n_email, n_ip, len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phone, "
            f"regexp_replace(t, '{PHONE_RE}', '<PHONE>', 'g') AS t FROM t2) "
            f"SELECT doc_id, t AS text, n_email, n_ip, n_phone FROM t3"
        ),
        "repetition": (
            r"WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM documents), "
            "u AS (SELECT doc_id, unnest(ws) AS wd FROM w), "
            "cnt AS (SELECT doc_id, wd, count(*) AS c FROM u GROUP BY 1, 2), "
            "tw AS (SELECT doc_id, max(c) AS mx, count(*) AS dis FROM cnt GROUP BY 1), "
            "g AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[]) "
            "ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END AS g2 FROM w) "
            "SELECT w.doc_id AS doc_id, len(w.ws) AS n_words, "
            "CASE WHEN len(w.ws) = 0 THEN 0.0 ELSE 1.0 - CAST(tw.dis AS DOUBLE) / len(w.ws) END AS dup_word_frac, "
            "CASE WHEN len(w.ws) = 0 THEN 0.0 ELSE CAST(tw.mx AS DOUBLE) / len(w.ws) END AS top_word_frac, "
            "CASE WHEN len(g.g2) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(g.g2)) AS DOUBLE) / len(g.g2) END AS dup_2gram_frac "
            "FROM w LEFT JOIN tw ON w.doc_id = tw.doc_id JOIN g ON w.doc_id = g.doc_id"
        ),
        "paragraph_dedup": (
            r"WITH w AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws FROM documents), "
            "lines AS (SELECT doc_id, i, array_to_string(ws[(i-1)*12+1 : i*12], ' ') AS para "
            "FROM w, UNNEST(range(1, CAST(ceil(len(ws)/12.0) AS BIGINT) + 1)) AS t(i) WHERE len(ws) > 0), "
            "k AS (SELECT doc_id, i, para, row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn FROM lines) "
            "SELECT doc_id, string_agg(para, chr(10) ORDER BY i) AS text FROM k WHERE rn = 1 GROUP BY doc_id"
        ),
        "lm_backoff": _lm_backoff_sql(),
        "lm_backoff_join": _lm_backoff_sql(),
        "lm_familiarity": (
            r"WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM documents), "
            "bg AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[]) "
            "ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END AS bs FROM w), "
            "e AS (SELECT doc_id, unnest(bs) AS b FROM bg), "
            "cnt AS (SELECT b, count(*) AS c FROM e GROUP BY b), "
            "filt AS (SELECT b, c FROM cnt WHERE c >= 2), "
            "num AS (SELECT e.doc_id, sum(filt.c) AS s FROM e JOIN filt USING (b) GROUP BY e.doc_id), "
            "den AS (SELECT doc_id, len(bs) AS n FROM bg) "
            "SELECT den.doc_id AS doc_id, CAST(den.n AS BIGINT) AS n_bigrams, "
            "CASE WHEN den.n = 0 THEN 0.0 ELSE CAST(coalesce(num.s, 0) AS DOUBLE) / den.n END AS familiarity "
            "FROM den LEFT JOIN num ON den.doc_id = num.doc_id"
        ),
        "decontam": (
            r"WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS ng "
            "FROM w, UNNEST(range(1, greatest(len(ws) - 2, 1))) AS t(i)), "
            "test AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0) "
            "SELECT g.doc_id AS doc_id, count(DISTINCT g.ng) AS n_hits "
            "FROM g JOIN test USING (ng) WHERE g.doc_id % 37 <> 0 GROUP BY g.doc_id"
        ),
        "dup_span_removal": _dup_span_removal_sql(),
        "dup_spans": (
            r"WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM documents), "
            "g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS ng "
            "FROM w, UNNEST(range(1, greatest(len(ws) - 2, 1))) AS t(i)), "
            "tot AS (SELECT doc_id, count(*) AS total_grams FROM g GROUP BY doc_id), "
            "dup AS (SELECT ng FROM g GROUP BY ng HAVING count(*) >= 2), "
            "hits AS (SELECT g.doc_id, count(*) AS dup_grams FROM g JOIN dup USING (ng) GROUP BY g.doc_id) "
            "SELECT hits.doc_id AS doc_id, dup_grams, total_grams, "
            "CAST(dup_grams AS DOUBLE) / total_grams AS dup_frac "
            "FROM hits JOIN tot ON hits.doc_id = tot.doc_id"
        ),
        "extract_links": (
            f"WITH t AS (SELECT doc_id, source, CASE lang {url_tld_case} ELSE 'com' END AS tld FROM documents), "
            "u AS (SELECT doc_id, 'https://' || source || '-' || CAST(doc_id AS VARCHAR) || '.' || tld AS origin FROM t), "
            "h AS (SELECT origin || '/p/' || CAST(doc_id AS VARCHAR) AS url, origin, "
            "'<html><body><a href=\"https://ext-' || CAST((doc_id*7+13) % 101 AS VARCHAR) || '.example/p/' || CAST((doc_id*7+13) % 101 AS VARCHAR) || '\">x</a><p>t</p>' "
            "|| '<a href=\"/p/' || CAST((doc_id*3+1) % 997 AS VARCHAR) || '\">y</a><a href=\"mailto:admin@example.com\">m</a><a href=\"#top\">t</a><a href=\"about.html\">r</a>' "
            "|| CASE WHEN doc_id % 4 = 0 THEN '<a href=\"http://mirror.example/' || CAST(doc_id AS VARCHAR) || '\">z</a>' ELSE '' END "
            "|| '</body></html>' AS html FROM u), "
            "e AS (SELECT url, origin, unnest(regexp_extract_all(html, 'href=\"([^\"]*)\"', 1)) AS href FROM h) "
            "SELECT url AS src_url, href, CASE WHEN regexp_matches(href, '^https?://') THEN href ELSE origin || href END AS dst_url "
            "FROM e WHERE regexp_matches(href, '^https?://') OR (href LIKE '/%' AND href NOT LIKE '//%')"
        ),
        "anchor_stats": (
            f"WITH t AS (SELECT doc_id, source, CASE lang {url_tld_case} ELSE 'com' END AS tld FROM documents), "
            "u AS (SELECT doc_id, 'https://' || source || '-' || CAST(doc_id AS VARCHAR) || '.' || tld AS origin FROM t), "
            "h AS (SELECT origin, "
            "'<html><body><a href=\"https://ext-' || CAST((doc_id*7+13) % 101 AS VARCHAR) || '.example/p/' || CAST((doc_id*7+13) % 101 AS VARCHAR) || '\">x</a><p>t</p>' "
            "|| '<a href=\"/p/' || CAST((doc_id*3+1) % 997 AS VARCHAR) || '\">y</a><a href=\"mailto:admin@example.com\">m</a><a href=\"#top\">t</a><a href=\"about.html\">r</a>' "
            "|| CASE WHEN doc_id % 4 = 0 THEN '<a href=\"http://mirror.example/' || CAST(doc_id AS VARCHAR) || '\">z</a>' ELSE '' END "
            "|| '</body></html>' AS html FROM u), "
            "e AS (SELECT origin, unnest(regexp_extract_all(html, 'href=\"([^\"]*)\"[^>]*>([^<]*)', 1)) AS href, "
            "unnest(regexp_extract_all(html, 'href=\"([^\"]*)\"[^>]*>([^<]*)', 2)) AS a FROM h), "
            "r AS (SELECT CASE WHEN regexp_matches(href, '^https?://') THEN href ELSE origin || href END AS dst_url, "
            r"nullif(trim(regexp_replace(a, '\s+', ' ', 'g')), '') AS anchor FROM e "
            "WHERE regexp_matches(href, '^https?://') OR (href LIKE '/%' AND href NOT LIKE '//%')) "
            "SELECT dst_url, count(*) AS n_links, min(anchor) AS top_anchor FROM r GROUP BY dst_url"
        ),
        "ip_geo_join": (
            f"WITH p AS (SELECT doc_id, (doc_id * {IPGEO_MULT}) % 4294967296 AS ip FROM documents), "
            "r AS (SELECT k * 67108864 AS lo, (k + 1) * 67108864 - 1 AS hi, 'cc-' || CAST(k AS VARCHAR) AS geo "
            "FROM (SELECT unnest(range(0, 64)) AS k) WHERE k % 4 <> 3) "
            "SELECT p.doc_id, p.ip, r.geo FROM p JOIN r ON p.ip BETWEEN r.lo AND r.hi"
        ),
        "degree_hist": (
            "WITH n AS (SELECT count(*) AS cnt FROM documents), "
            "e AS (SELECT doc_id AS src, (doc_id * 7 + j * 13) % (SELECT cnt FROM n) AS dst "
            "FROM documents, UNNEST([1, 2, 3]) AS t(j) WHERE doc_id % 11 <> 0), "
            "d AS (SELECT doc_id AS node, count(e.dst) AS deg FROM documents "
            "LEFT JOIN e ON e.dst = documents.doc_id GROUP BY doc_id) "
            "SELECT deg AS degree, count(*) AS n_nodes FROM d GROUP BY deg"
        ),
        "jsonl_roundtrip": "SELECT doc_id, text, lang FROM documents",
        "sliding_chunks": (
            "WITH w AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents), "
            "c AS (SELECT doc_id, ws, UNNEST(range(0, 1 + CAST(ceil(greatest(len(ws) - 64, 0) / 48.0) AS BIGINT))) AS chunk_id "
            "FROM w WHERE len(ws) > 0) "
            "SELECT doc_id, chunk_id, least(64, len(ws) - chunk_id * 48) AS n_tokens, "
            "array_to_string(ws[chunk_id * 48 + 1 : least(chunk_id * 48 + 64, len(ws))], ' ') AS chunk FROM c"
        ),
        "pagerank": _pagerank_sql(),
        "hits": _hits_sql(),
        "pagerank_personalized": _ppr_sql(),
        "linreg_quality": _linreg_sql(),
        "link_components": (
            "WITH RECURSIVE n AS (SELECT count(*) AS cnt FROM documents), "
            "e AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents "
            "WHERE doc_id % 7 <> 0 AND doc_id + 1 < (SELECT cnt FROM n)), "
            "sym AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e), "
            "nodes AS (SELECT DISTINCT x AS node FROM sym), "
            "r(node, lab) AS (SELECT node, node FROM nodes "
            "UNION SELECT s.y, r.lab FROM r JOIN sym s ON s.x = r.node) "
            "SELECT node AS doc_id, min(lab) AS comp FROM r GROUP BY node"
        ),
        "link_components_bsp": (
            "WITH RECURSIVE n AS (SELECT count(*) AS cnt FROM documents), "
            "e AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents "
            "WHERE doc_id % 7 <> 0 AND doc_id + 1 < (SELECT cnt FROM n)), "
            "sym AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e), "
            "r(node, lab) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT s.y, r.lab FROM r JOIN sym s ON s.x = r.node) "
            "SELECT node AS doc_id, min(lab) AS comp FROM r GROUP BY node"
        ),
        "centroid_per_label": (
            f"WITH q AS (SELECT label, u.i AS dim, "
            f"CAST(floor(CAST(embedding[u.i + 1] AS DOUBLE) * {1 << CENTROID_QBITS}) AS BIGINT) AS qv "
            "FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)) "
            f"SELECT CAST(label AS BIGINT) AS label, dim, "
            f"CAST(sum(qv) AS DOUBLE) / (count(*) * CAST({1 << CENTROID_QBITS} AS DOUBLE)) AS centroid, "
            "count(*) AS n FROM q GROUP BY label, dim"
        ),
        "mixture_sample": (
            r"WITH w AS (SELECT doc_id, lang, CASE WHEN trim(text) = '' THEN 0 ELSE "
            r"len(regexp_split_to_array(trim(text), '\s+')) END AS nt FROM documents), "
            "t AS (SELECT lang, sum(nt) AS tok FROM w GROUP BY lang), "
            "g AS (SELECT CAST(sum(tok) * 1 // (4 * count(*)) AS BIGINT) AS target FROM t), "
            "r AS (SELECT lang, least(1.0, CAST((SELECT target FROM g) AS DOUBLE) / CAST(tok AS DOUBLE)) AS rate "
            "FROM t WHERE tok > 0) "
            "SELECT w.doc_id, w.lang FROM w JOIN r USING (lang) "
            f"WHERE CAST({_mix_h()} AS DOUBLE) / 4294967296.0 < r.rate"
        ),
        "text_normalize": (
            "WITH m AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
            "THEN text || chr(1) || 'cafee' || chr(769) ELSE text END AS text FROM documents) "
            r"SELECT doc_id, nfc_normalize(regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')) AS text_norm, "
            "doc_id % 3 = 0 AS changed FROM m"
        ),
        "extract_title": (
            "WITH h AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 "
            "THEN '<html><head></head><body><p>x</p></body></html>' "
            "ELSE '<html><head><title>' || CASE WHEN doc_id % 2 = 0 "
            "THEN 'R&amp;D &lt;page ' || CAST(doc_id AS VARCHAR) || '&gt;' "
            "ELSE 'Crawl   report' || chr(10) || CAST(doc_id AS VARCHAR) END "
            "|| '</title></head><body><p>x</p></body></html>' END AS html FROM documents) "
            "SELECT doc_id, replace(replace(replace(trim(regexp_replace("
            r"coalesce(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title\s*>', 1), ''), "
            r"'\s+', ' ', 'g')), '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS title FROM h"
        ),
        "bfs_hops": (
            "WITH RECURSIVE n AS (SELECT count(*) AS cnt FROM documents), "
            "e AS (SELECT doc_id AS src, (doc_id * 7 + j * 13) % (SELECT cnt FROM n) AS dst "
            "FROM documents, UNNEST([1, 2, 3]) AS t(j) WHERE doc_id % 11 <> 0), "
            "seeds AS (SELECT doc_id AS node FROM documents WHERE doc_id % 97 = 0), "
            "r(node, hop) AS (SELECT node, 0 FROM seeds "
            f"UNION SELECT e.dst, r.hop + 1 FROM r JOIN e ON e.src = r.node WHERE r.hop < {BFS_MAX_HOPS}) "
            "SELECT node AS doc_id, min(hop) AS hop FROM r GROUP BY node"
        ),
        "warc_roundtrip": (
            f"WITH t AS (SELECT doc_id, text, CASE lang {url_tld_case} ELSE 'com' END AS tld, source FROM documents) "
            "SELECT 'https://' || source || '-' || CAST(doc_id AS VARCHAR) || '.' || tld || '/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "strftime(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND, '%Y-%m-%dT%H:%M:%SZ') AS warc_date, "
            "text FROM t"
        ),
        "pack_offsets": (
            r"WITH w AS (SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER "
            "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS token_start FROM w) "
            f"SELECT doc_id, n_tokens, CAST(token_start AS BIGINT) AS token_start, "
            f"CAST(token_start // {PACK_CAPACITY} AS BIGINT) AS first_pack, "
            f"CAST(CASE WHEN n_tokens = 0 THEN token_start // {PACK_CAPACITY} "
            f"ELSE (token_start + n_tokens - 1) // {PACK_CAPACITY} END AS BIGINT) AS last_pack FROM c"
        ),
        "url_dedup": (
            f"WITH t AS (SELECT doc_id, source, CASE lang {url_tld_case} ELSE 'com' END AS tld FROM documents), "
            "u AS (SELECT doc_id, source || '-' || CAST(doc_id AS VARCHAR) || '.' || tld AS dom FROM t), "
            "base AS (SELECT doc_id, dom, 'https://' || dom || '/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts FROM u), "
            "v AS (SELECT doc_id, url, warc_ts FROM base "
            "UNION ALL SELECT doc_id, url || '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR), "
            "warc_ts + INTERVAL 1 HOUR FROM base WHERE doc_id % 3 = 0 "
            "UNION ALL SELECT doc_id, 'HTTPS://' || upper(dom) || '/p/' || CAST(doc_id AS VARCHAR) || '/', "
            "warc_ts + INTERVAL 2 HOUR FROM base WHERE doc_id % 5 = 0), "
            "c0 AS (SELECT doc_id, url, warc_ts, regexp_replace(url, '[?#].*$', '', 'g') AS s1 FROM v), "
            f"c1 AS (SELECT *, regexp_extract(s1, '{_HEAD_RE}') AS hd FROM c0), "
            "c AS (SELECT doc_id, url, warc_ts, regexp_replace(CASE WHEN hd <> '' "
            "THEN lower(hd) || substr(s1, len(hd) + 1) ELSE s1 END, '/$', '', 'g') AS canon_url FROM c1), "
            "k AS (SELECT *, row_number() OVER (PARTITION BY canon_url ORDER BY warc_ts DESC, url ASC) AS rn FROM c) "
            "SELECT canon_url, url, warc_ts, doc_id FROM k WHERE rn = 1"
        ),
        "html_extract": (
            # the north-star byte-identity invariant: strip-mode extraction
            # over the synthesized chrome must return `text` exactly, so the
            # oracle is the url synthesis + the text column + TRUE
            f"WITH t AS (SELECT doc_id, text, CASE lang {url_tld_case} ELSE 'com' END AS tld, source FROM documents) "
            "SELECT 'https://' || source || '-' || CAST(doc_id AS VARCHAR) || '.' || tld || '/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "text AS extracted_text, TRUE AS matches FROM t"
        ),
        "bm25_topk": _bm25_sql(),
        "stratified_sample": _stratified_sample_sql(),
        "dedup_incremental": (
            "WITH seen AS (SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 3 = 0) "
            "SELECT d.doc_id, sha256(d.text) AS text_hash FROM documents d "
            "LEFT JOIN seen ON sha256(d.text) = seen.h WHERE seen.h IS NULL"
        ),
        "reservoir_sample": (
            "SELECT doc_id, lang FROM documents "
            f"ORDER BY {_reservoir_h()}, doc_id LIMIT {RESERVOIR_K}"
        ),
        "reservoir_per_lang": (
            "SELECT doc_id, lang FROM (SELECT doc_id, lang, "
            f"row_number() OVER (PARTITION BY lang ORDER BY {_reservoir_h()}, doc_id) AS rn "
            "FROM documents) WHERE rn <= 10"
        ),
        "doclen_quantiles": " UNION ALL ".join(
            f"SELECT {q} AS q, CAST(quantile_disc(n_chars, {q}) AS DOUBLE) AS value FROM documents"
            for q in QUANTILE_QS
        ),
        "lang_length_quantiles": (
            "SELECT lang, 0.5 AS q, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS value "
            "FROM documents GROUP BY lang UNION ALL "
            "SELECT lang, 0.9 AS q, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS value "
            "FROM documents GROUP BY lang"
        ),
        "postings_lookup": (
            r"WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), "
            "x -> x <> '')) AS token FROM documents) "
            "SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks "
            f"WHERE token IN {POSTINGS_TERMS!r} GROUP BY token, doc_id"
        ),
        "collocations": (
            r"WITH toks AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS a "
            "FROM documents), uni AS (SELECT unnest(a) AS w FROM toks), "
            "uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w), "
            "nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni), "
            "grams AS (SELECT unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS ngram "
            "FROM toks WHERE len(a) >= 2), "
            f"bc AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt FROM grams GROUP BY ngram HAVING COUNT(*) >= {COLLOC_MIN}), "
            "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grams) "
            "SELECT bc.ngram, bc.cnt, "
            "(CAST(bc.cnt AS DOUBLE) * CAST(nu.n AS DOUBLE) * CAST(nu.n AS DOUBLE)) / "
            "(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS lift "
            "FROM bc JOIN uc ca ON ca.w = split_part(bc.ngram, ' ', 1) "
            "JOIN uc cb ON cb.w = split_part(bc.ngram, ' ', 2) "
            "CROSS JOIN nu CROSS JOIN nb "
            f"ORDER BY lift DESC, bc.ngram LIMIT {COLLOC_K}"
        ),
        "tpch_q14": (
            "WITH li AS (SELECT CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * "
            "(100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev, "
            "starts_with(p_type, 'PROMO') AS promo "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"WHERE l_shipdate >= TIMESTAMP '{TPCH_Q14_LO} 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '{TPCH_Q14_HI} 00:00:00'), "
            "s AS (SELECT CAST(SUM(CASE WHEN promo THEN rev ELSE 0 END) AS BIGINT) AS promo_cents2, "
            "CAST(SUM(rev) AS BIGINT) AS total_cents2 FROM li) "
            "SELECT promo_cents2, total_cents2, "
            "100.0 * CAST(promo_cents2 AS DOUBLE) / CAST(total_cents2 AS DOUBLE) AS promo_revenue_pct FROM s"
        ),
        "script_mix": (
            "SELECT doc_id, "
            + ", ".join(
                rf"CAST(length(regexp_replace(text, '[^\p{{{s}}}]', '', 'g')) AS DOUBLE)"
                f"/greatest(length(text), 1) AS frac_{s.lower()}"
                for s in ("Arabic", "Cyrillic", "Han", "Latin")
            )
            + ", (SELECT s FROM (SELECT unnest(['Arabic','Cyrillic','Han','Latin']) AS s, "
            r"unnest([length(regexp_replace(text, '[^\p{Arabic}]', '', 'g')), "
            r"length(regexp_replace(text, '[^\p{Cyrillic}]', '', 'g')), "
            r"length(regexp_replace(text, '[^\p{Han}]', '', 'g')), "
            r"length(regexp_replace(text, '[^\p{Latin}]', '', 'g'))]) AS c) "
            "ORDER BY c DESC, s LIMIT 1) AS dominant_script FROM documents"
        ),
        "lang_moments": (
            "WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(n_chars) AS BIGINT) AS s1, "
            "CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2 FROM documents GROUP BY lang) "
            "SELECT lang, n, s1, s2, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, "
            "(CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE)) "
            "/ CAST(n AS DOUBLE) AS var_pop FROM s"
        ),
        "lang_distinct_sources": (
            "SELECT lang, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources "
            "FROM documents GROUP BY lang"
        ),
        "length_band_filter": (
            "SELECT doc_id, n_chars FROM documents WHERE n_chars >= "
            f"(SELECT quantile_disc(n_chars, {BAND_LO_Q}) FROM documents) "
            f"AND n_chars <= (SELECT quantile_disc(n_chars, {BAND_HI_Q}) FROM documents)"
        ),
        "top_bigrams": (
            r"WITH toks AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS a "
            "FROM documents), grams AS ("
            "SELECT unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS ngram "
            "FROM toks WHERE len(a) >= 2) "
            "SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt FROM grams "
            f"GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT {TOP_NGRAM_K}"
        ),
        "tpch_q5": (
            "WITH o AS (SELECT o_orderkey, c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey "
            f"WHERE o_orderdate >= TIMESTAMP '{TPCH_Q5_LO} 00:00:00' AND o_orderdate < TIMESTAMP '{TPCH_Q5_HI} 00:00:00'), "
            "l AS (SELECT l_orderkey, s_nationkey, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) "
            "SELECT n_name, CAST(SUM(rev) AS BIGINT) AS revenue_cents2 "
            "FROM l JOIN o ON l.l_orderkey = o.o_orderkey "
            "JOIN nation ON l.s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey "
            f"WHERE r_name = '{TPCH_Q5_REGION}' AND l.s_nationkey = o.c_nationkey "
            "GROUP BY n_name"
        ),
        "top_docs_per_lang": (
            "WITH q AS (SELECT lang, doc_id, "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/greatest(length(text), 1) AS alpha_ratio "
            "FROM documents) "
            "SELECT lang, doc_id, alpha_ratio, rank FROM ("
            "SELECT lang, doc_id, alpha_ratio, "
            "row_number() OVER (PARTITION BY lang ORDER BY alpha_ratio DESC, doc_id) AS rank FROM q) "
            f"WHERE rank <= {TOPDOCS_K}"
        ),
        "tpch_q6": (
            "SELECT CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * "
            "CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents2 "
            f"FROM lineitem WHERE l_shipdate >= TIMESTAMP '{TPCH_Q6_LO} 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '{TPCH_Q6_HI} 00:00:00' "
            "AND CAST(floor(l_discount*100 + 0.5) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        "tpch_q10": (
            "WITH l AS (SELECT l_orderkey, CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * "
            "(100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev FROM lineitem WHERE l_returnflag = 'R'), "
            f"o AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{TPCH_Q10_LO} 00:00:00' "
            f"AND o_orderdate < TIMESTAMP '{TPCH_Q10_HI} 00:00:00'), "
            "pc AS (SELECT o_custkey, CAST(sum(rev) AS BIGINT) AS revenue_cents2 "
            "FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY o_custkey) "
            "SELECT CAST(pc.o_custkey AS BIGINT) AS c_custkey, c.c_name, pc.revenue_cents2 "
            "FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey "
            f"ORDER BY pc.revenue_cents2 DESC, c_custkey LIMIT {TPCH_Q10_K}"
        ),
        "tpch_q7": (
            "WITH l AS (SELECT l_orderkey, s_nationkey, year(l_shipdate) AS l_year, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            f"WHERE l_shipdate >= TIMESTAMP '{TPCH_Q7_LO} 00:00:00' AND l_shipdate < TIMESTAMP '{TPCH_Q7_HI} 00:00:00' "
            f"AND s_nationkey IN {TPCH_Q7_NATIONS}), "
            "o AS (SELECT o_orderkey, c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey "
            f"WHERE c_nationkey IN {TPCH_Q7_NATIONS}) "
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, CAST(l_year AS BIGINT) AS l_year, "
            "CAST(SUM(rev) AS BIGINT) AS revenue_cents2 "
            "FROM l JOIN o ON l.l_orderkey = o.o_orderkey "
            "JOIN nation n1 ON l.s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON o.c_nationkey = n2.n_nationkey "
            f"WHERE (l.s_nationkey = {TPCH_Q7_NATIONS[0]} AND o.c_nationkey = {TPCH_Q7_NATIONS[1]}) "
            f"OR (l.s_nationkey = {TPCH_Q7_NATIONS[1]} AND o.c_nationkey = {TPCH_Q7_NATIONS[0]}) "
            "GROUP BY 1, 2, 3"
        ),
        "tpch_q8": (
            "WITH l AS (SELECT l_orderkey, s_nationkey, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev "
            f"FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = '{TPCH_Q8_TYPE}' "
            "JOIN supplier ON l_suppkey = s_suppkey), "
            "o AS (SELECT o_orderkey, year(o_orderdate) AS o_year FROM orders "
            "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey "
            f"WHERE n_regionkey = {TPCH_Q8_REGION} "
            f"AND o_orderdate >= TIMESTAMP '{TPCH_Q7_LO} 00:00:00' AND o_orderdate < TIMESTAMP '{TPCH_Q7_HI} 00:00:00') "
            "SELECT CAST(o_year AS BIGINT) AS o_year, "
            f"CAST(SUM(CASE WHEN s_nationkey = {TPCH_Q8_NATION} THEN rev ELSE 0 END) AS BIGINT) AS nation_cents2, "
            "CAST(SUM(rev) AS BIGINT) AS total_cents2, "
            f"CAST(SUM(CASE WHEN s_nationkey = {TPCH_Q8_NATION} THEN rev ELSE 0 END) AS DOUBLE) / "
            "CAST(SUM(rev) AS DOUBLE) AS mkt_share "
            "FROM l JOIN o ON l_orderkey = o_orderkey GROUP BY o_year"
        ),
        "tpch_q9": (
            "WITH l AS (SELECT l_orderkey, s_nationkey, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"JOIN supplier ON l_suppkey = s_suppkey WHERE p_name LIKE '%{TPCH_Q9_NAME_SUBSTR}%') "
            "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "CAST(SUM(rev) AS BIGINT) AS profit_cents2 "
            "FROM l JOIN orders ON l_orderkey = o_orderkey "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2"
        ),
        "tpch_q11": (
            "WITH v AS (SELECT l_partkey AS p_partkey, "
            "CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            f"WHERE s_nationkey = {TPCH_Q11_NATION} GROUP BY l_partkey) "
            "SELECT p_partkey, value_cents FROM v "
            f"WHERE value_cents * {TPCH_Q11_FRACTION_DEN} > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)"
        ),
        "tpch_q12": (
            "WITH j AS (SELECT datediff('day', o_orderdate, l_shipdate) AS delay, o_orderpriority "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) "
            "SELECT CASE WHEN delay > 90 THEN '91+' WHEN delay > 30 THEN '31-90' ELSE '0-30' END AS delay_bucket, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM j GROUP BY 1"
        ),
        "tpch_q13": (
            "WITH pc AS (SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count "
            "FROM customer LEFT OUTER JOIN "
            f"(SELECT o_custkey FROM orders WHERE o_orderpriority <> '{TPCH_Q13_EXCL_PRIORITY}') o "
            "ON c_custkey = o_custkey GROUP BY c_custkey) "
            "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM pc GROUP BY c_count"
        ),
        "tpch_q15": (
            "WITH r AS (SELECT l_suppkey AS s_suppkey, "
            "CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * "
            "(100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT) AS total_revenue_cents2 "
            f"FROM lineitem WHERE l_shipdate >= TIMESTAMP '{TPCH_Q15_LO} 00:00:00' "
            f"AND l_shipdate < TIMESTAMP '{TPCH_Q15_HI} 00:00:00' GROUP BY l_suppkey) "
            "SELECT r.s_suppkey, s_name, total_revenue_cents2 FROM r JOIN supplier ON r.s_suppkey = supplier.s_suppkey "
            "WHERE total_revenue_cents2 = (SELECT MAX(total_revenue_cents2) FROM r)"
        ),
        "tpch_q16": (
            "WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM pairs JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            f"WHERE p_brand <> '{TPCH_Q16_EXCL_BRAND}' AND p_type <> '{TPCH_Q16_EXCL_TYPE}' "
            f"AND p_size IN {TPCH_Q16_SIZES} AND s_acctbal >= 0 "
            "GROUP BY 1, 2, 3"
        ),
        "tpch_q17": (
            "WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS price_c "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"WHERE p_brand = '{TPCH_Q17_BRAND}' AND p_size <= {TPCH_Q17_MAX_SIZE}), "
            "st AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY l_partkey) "
            "SELECT CAST(COALESCE(SUM(price_c), 0) AS BIGINT) AS total_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "CAST(COALESCE(SUM(price_c), 0) AS DOUBLE) / 7.0 AS avg_yearly_cents "
            "FROM li JOIN st USING (l_partkey) WHERE qty * 5 * cnt < sum_qty"
        ),
        "tpch_q18": (
            "WITH big AS (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            f"FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > {TPCH_Q18_MIN_QTY}) "
            "SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS o_totalprice_cents, sum_qty "
            "FROM big JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "tpch_q19": (
            "SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * "
            "(100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))), 0) AS BIGINT) AS revenue_cents2 "
            "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE "
            + " OR ".join(
                f"(p_brand = '{br}' AND p_size BETWEEN {s_lo} AND {s_hi} "
                f"AND l_quantity BETWEEN {q_lo} AND {q_hi})"
                for br, s_lo, s_hi, q_lo, q_hi in TPCH_Q19_BRANCHES
            )
        ),
        "dsir_select": _dsir_sql(),
        "dsir_select_join": _dsir_sql(),
        "bloom_dedup": (
            "SELECT d.doc_id, d.lang, d.source FROM documents d "
            "WHERE NOT EXISTS (SELECT 1 FROM documents s "
            "WHERE s.doc_id % 3 = 0 AND s.text = d.text)"
        ),
        "cms_heavy_tokens": (
            r"WITH toks AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), "
            "x -> x <> '')) AS ngram FROM documents), "
            "thr AS (SELECT GREATEST(5, COUNT(*) // 50) AS t FROM documents) "
            "SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks "
            "GROUP BY ngram HAVING COUNT(*) >= (SELECT t FROM thr)"
        ),
        "semdedup": (
            # the full SemDeDup contract in SQL: seed pick, double-precision
            # cosine assignment (argmax, ties to the lowest seed), and the
            # lower-id near-dup prune — all on the same synthesized input
            # (2x-scaled copies of vec_id % 5 == 0 rows at vec_id + 10^9)
            "WITH inp AS (SELECT vec_id, embedding FROM embeddings "
            "UNION ALL SELECT vec_id + 1000000000, list_transform(embedding, x -> x * 2) "
            "FROM embeddings WHERE vec_id % 5 = 0), "
            "pos AS (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i FROM inp), "
            "elems AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS val FROM pos), "
            "norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS nrm FROM elems GROUP BY vec_id), "
            "seed_ids AS (SELECT vec_id AS sid, row_number() OVER (ORDER BY vec_id) - 1 AS snum "
            "FROM inp ORDER BY vec_id LIMIT 8), "
            "cos_s AS (SELECT e.vec_id, s.snum, SUM(e.val * se.val) / (MAX(ne.nrm) * MAX(ns.nrm)) AS cos "
            "FROM elems e JOIN seed_ids s ON TRUE "
            "JOIN elems se ON se.vec_id = s.sid AND se.i = e.i "
            "JOIN norms ne ON ne.vec_id = e.vec_id JOIN norms ns ON ns.vec_id = s.sid "
            "GROUP BY e.vec_id, s.snum), "
            "assign AS (SELECT vec_id, snum AS cluster FROM "
            "(SELECT vec_id, snum, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, snum ASC) AS rn "
            "FROM cos_s) WHERE rn = 1), "
            "pair_cos AS (SELECT b.vec_id AS idb, "
            "SUM(ea.val * eb.val) / (MAX(na.nrm) * MAX(nb.nrm)) AS cos "
            "FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id "
            "JOIN elems ea ON ea.vec_id = a.vec_id "
            "JOIN elems eb ON eb.vec_id = b.vec_id AND eb.i = ea.i "
            "JOIN norms na ON na.vec_id = a.vec_id JOIN norms nb ON nb.vec_id = b.vec_id "
            "GROUP BY a.vec_id, b.vec_id), "
            "dup AS (SELECT DISTINCT idb FROM pair_cos WHERE cos >= 0.8) "
            "SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster FROM assign a "
            "WHERE a.vec_id NOT IN (SELECT idb FROM dup)"
        ),
        "hashed_tfidf": (
            r"WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), "
            "x -> x <> '')) AS tok FROM documents), "
            "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok), "
            "df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok), "
            "w AS (SELECT t.doc_id, "
            "CAST(CAST(CONCAT('0x', substr(sha256(t.tok), 1, 15)) AS UBIGINT) % 262144 AS BIGINT) AS bucket, "
            "t.tf * (((SELECT COUNT(*) FROM documents) * 1000000) // d.df) AS wt "
            "FROM tf t JOIN df d ON t.tok = d.tok) "
            "SELECT doc_id, bucket, CAST(SUM(wt) AS BIGINT) AS weight "
            "FROM w GROUP BY doc_id, bucket HAVING SUM(wt) > 0"
        ),
        "blocklist": (
            "WITH f AS (SELECT doc_id, "
            + " + ".join(
                f"(CASE WHEN instr(lower(text), '{t}') > 0 THEN 1 ELSE 0 END)"
                for t in BLOCKLIST_TERMS
            )
            + " AS n_blocked FROM documents) "
            "SELECT doc_id, CAST(n_blocked AS BIGINT) AS n_blocked FROM f WHERE n_blocked >= 1"
        ),
        "tpch_q20": (
            "WITH sp AS (SELECT l_suppkey, l_partkey FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_name LIKE 'small%' "
            f"AND l_shipdate >= TIMESTAMP '{TPCH_Q20_LO} 00:00:00' AND l_shipdate < TIMESTAMP '{TPCH_Q20_HI} 00:00:00' "
            f"GROUP BY 1, 2 HAVING SUM(CAST(l_quantity AS BIGINT)) > {TPCH_Q20_MIN_QTY}), "
            "s AS (SELECT DISTINCT l_suppkey FROM sp) "
            "SELECT s_suppkey, s_name FROM s JOIN supplier ON l_suppkey = s_suppkey "
            f"JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey = {TPCH_Q20_REGION}"
        ),
        "tpch_q21": (
            "WITH j AS (SELECT l_orderkey, l_suppkey, "
            f"(l_shipdate > o_orderdate + INTERVAL {TPCH_Q21_LATE_DAYS} DAY) AS late "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'), "
            "agg AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS ns, "
            "COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl, "
            "MIN(CASE WHEN late THEN l_suppkey END) AS ls FROM j GROUP BY 1) "
            "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM agg "
            "JOIN supplier ON ls = s_suppkey JOIN nation ON s_nationkey = n_nationkey "
            f"WHERE ns >= 2 AND nl = 1 AND n_name = '{TPCH_Q21_NATION}' GROUP BY s_name"
        ),
        "tpch_q22": (
            "WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS cntrycode, "
            "CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c FROM customer "
            f"WHERE c_nationkey IN {TPCH_Q22_CODES}), "
            "a AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM c WHERE bal_c > 0), "
            "f AS (SELECT * FROM c, a WHERE bal_c * n > s AND NOT EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')) "
            "SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, "
            "CAST(SUM(bal_c) AS BIGINT) AS totacctbal_cents FROM f GROUP BY cntrycode"
        ),
        "tpch_q2": (
            f"WITH pr AS (SELECT p_partkey, p_name FROM part WHERE p_size = {TPCH_Q2_SIZE}), "
            "sr AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            f"WHERE n_regionkey = {TPCH_Q2_REGION}), "
            "pairs AS (SELECT l_partkey, l_suppkey, "
            "CAST(MIN(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS cost_c "
            "FROM lineitem JOIN pr ON l_partkey = p_partkey JOIN sr ON l_suppkey = s_suppkey "
            "GROUP BY 1, 2), "
            "m AS (SELECT l_partkey, MIN(cost_c) AS mc FROM pairs GROUP BY 1) "
            "SELECT pairs.l_partkey AS p_partkey, p.p_name, s.s_name, s.n_name, "
            "CAST(floor(s.s_acctbal*100 + 0.5) AS BIGINT) AS s_acctbal_cents, cost_c AS cost_cents "
            "FROM pairs JOIN m ON pairs.l_partkey = m.l_partkey AND pairs.cost_c = m.mc "
            "JOIN pr p ON pairs.l_partkey = p.p_partkey "
            "JOIN sr s ON pairs.l_suppkey = s.s_suppkey"
        ),
        "tpch_q4": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count FROM orders o "
            f"WHERE o_orderdate >= TIMESTAMP '{TPCH_Q4_LO} 00:00:00' "
            f"AND o_orderdate < TIMESTAMP '{TPCH_Q4_HI} 00:00:00' "
            "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_returnflag = 'R') GROUP BY o_orderpriority"
        ),
        "tpch_q1": (
            f"WITH f AS (SELECT * FROM lineitem WHERE l_shipdate <= TIMESTAMP '{TPCH_CUTOFF} 00:00:00'), "
            "c AS (SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS base_c, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS disc_c2 FROM f) "
            "SELECT l_returnflag, l_linestatus, CAST(SUM(qty) AS BIGINT) AS sum_qty, "
            "CAST(SUM(base_c) AS BIGINT) AS sum_base_cents, CAST(SUM(disc_c2) AS BIGINT) AS sum_disc_cents2, "
            "CAST(COUNT(*) AS BIGINT) AS count_order, "
            "CAST(SUM(qty) AS DOUBLE)/COUNT(*) AS avg_qty "
            "FROM c GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q3": (
            f"WITH li AS (SELECT l_orderkey, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS rev "
            f"FROM lineitem WHERE l_shipdate > TIMESTAMP '{TPCH_CUTOFF} 00:00:00') "
            "SELECT c.c_mktsegment, o.o_orderpriority, CAST(SUM(li.rev) AS BIGINT) AS revenue_cents2 "
            "FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment, o.o_orderpriority"
        ),
        "corpus_filter": (
            r"WITH w AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, text, ws, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[]) "
            "ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END AS g2 FROM w), "
            "f AS (SELECT doc_id, len(ws) AS n_words, "
            "CASE WHEN len(g2) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)/len(g2) END AS dup_2gram_frac, "
            "CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS DOUBLE)/greatest(len(ws), 1) AS mwl, "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/greatest(length(text), 1) AS alpha_ratio FROM g) "
            f"SELECT doc_id, n_words, alpha_ratio, dup_2gram_frac, mwl FROM f "
            f"WHERE n_words >= {CF_MIN_WORDS} AND dup_2gram_frac <= {CF_MAX_DUP2} "
            f"AND alpha_ratio >= {CF_MIN_ALPHA} AND mwl >= {CF_MWL_LO} AND mwl <= {CF_MWL_HI}"
        ),
        "domain_stats": (
            "WITH u AS (SELECT doc_id, n_chars, "
            "'site' || CAST(doc_id % 37 AS VARCHAR) || '.' || "
            "list_extract(['com','org','co.uk','de','net'], CAST(doc_id % 5 AS INT) + 1) AS host FROM documents), "
            "d AS (SELECT n_chars, host, "
            "regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS last2, "
            "regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) AS last3 FROM u), "
            "e AS (SELECT n_chars, CASE WHEN "
            "list_contains(['ac','co','com','edu','gov','net','org'], regexp_extract(last2, '^([^.]+)\\.', 1)) "
            "AND last3 <> '' THEN last3 ELSE last2 END AS domain FROM d) "
            "SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(SUM(n_chars) AS DOUBLE)/COUNT(*) AS mean_chars FROM e GROUP BY domain"
        ),
        "seq_chunks": (
            "WITH w AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents), "
            f"c AS (SELECT doc_id, ws, UNNEST(range(0, CAST(ceil(len(ws)/{SEQ_LEN}.0) AS BIGINT))) AS chunk_id FROM w) "
            f"SELECT doc_id, chunk_id, least({SEQ_LEN}, len(ws) - chunk_id*{SEQ_LEN}) AS n_tokens, "
            f"array_to_string(ws[chunk_id*{SEQ_LEN} + 1 : least((chunk_id+1)*{SEQ_LEN}, len(ws))], ' ') AS chunk FROM c "
            f"WHERE least({SEQ_LEN}, len(ws) - chunk_id*{SEQ_LEN}) >= 1"
        ),
        "ann_topk": (
            f"WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {ANN_NQ}), "
            "s AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS c "
            "FROM q, embeddings e) "
            "SELECT query_id, vec_id, rank FROM ("
            "SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank FROM s"
            f") WHERE rank <= {ANN_K}"
        ),
        "embed_dup_pairs": (
            "SELECT a.vec_id AS a, b.vec_id AS b FROM embeddings a, embeddings b "
            "WHERE a.vec_id < b.vec_id AND "
            f"list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}"
        ),
        "window_agg": (
            "SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id, COUNT(*) AS n, "
            "MIN(value) AS min_value, MAX(value) AS max_value FROM events GROUP BY 1, 2"
        ),
        "sessionize": (
            "WITH d AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "FROM events) "
            "SELECT user_id, 1 + COUNT(*) FILTER (WHERE prev IS NOT NULL AND "
            f"epoch_us(ts) - epoch_us(prev) > {SESSION_GAP_US}) AS n_sessions FROM d GROUP BY user_id"
        ),
        "top_users": (
            "SELECT user_id, n FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id) "
            "ORDER BY n DESC, user_id LIMIT 10"
        ),
        "spatial_sort": (
            f"WITH pts AS ({_PTS_SQL}), c AS (SELECT doc_id, "
            f"{_grid.sql_expr('lon', 'lat', GRID_LEVEL)} AS cell_id FROM pts) "
            "SELECT doc_id, cell_id, "
            "row_number() OVER (ORDER BY cell_id, doc_id) AS pos FROM c"
        ),
        "zone_clip_area": (
            f"WITH zones AS ({_ZONES_SQL}), c AS (SELECT zone_id, "
            f"greatest(0.0, least(x0 + {ZN_SIDE}, 50.0) - greatest(x0, -50.0)) * "
            f"greatest(0.0, least(y0 + {ZN_SIDE}, 50.0) - greatest(y0, -50.0)) AS clip_area FROM zones) "
            "SELECT zone_id, clip_area FROM c WHERE clip_area > 0"
        ),
        "zone_diff_area": (
            f"WITH zones AS ({_ZONES_SQL}), c AS (SELECT zone_id, "
            f"greatest(0.0, least(x0 + {ZN_SIDE}, 50.0) - greatest(x0, -50.0)) * "
            f"greatest(0.0, least(y0 + {ZN_SIDE}, 50.0) - greatest(y0, -50.0)) AS clip_area FROM zones) "
            f"SELECT zone_id, {ZN_SIDE} * {ZN_SIDE} - clip_area AS diff_area FROM c"
        ),
        "zone_buffer_area": (
            f"WITH zones AS ({_ZONES_SQL}), "
            "b AS (SELECT zone_id, CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) * (zone_id % 5) AS r FROM zones) "
            f"SELECT zone_id, r, "
            f"CAST(round((CAST({ZN_SIDE} * {ZN_SIDE} AS DOUBLE) + CAST(4 * {ZN_SIDE} AS DOUBLE) * r "
            "+ CAST(16 AS DOUBLE) * r * r * sin(pi() / 16)) * 10000) AS BIGINT) AS dil_area_e4, "
            f"CAST(round((CAST({ZN_SIDE} AS DOUBLE) - 2 * r) * (CAST({ZN_SIDE} AS DOUBLE) - 2 * r) * 10000) AS BIGINT) AS ero_area_e4 FROM b"
        ),
        "sliding_window": (
            f"WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events), "
            f"w AS (SELECT e.event_type, (e.us // {SLIDE_US} - k.k) * {SLIDE_US} AS win_start "
            f"FROM e, range(4) k(k)) "
            "SELECT event_type, win_start, COUNT(*) AS n FROM w GROUP BY 1, 2"
        ),
        "asof_join": (
            "WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'), "
            "errors AS (SELECT event_id AS e_id, user_id, ts AS e_ts FROM events WHERE event_type = 'error') "
            "SELECT c.event_id, c.user_id, CAST(COALESCE(e.e_id, -1) AS BIGINT) AS err_id "
            "FROM clicks c ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts >= e.e_ts"
        ),
        "multimodal_meta": (
            "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
            "substr(sha256(text), 1, 16) AS sha_prefix FROM documents"
        ),
        "audio_features": (
            # mean codepoint per full 512-char window (chars == bytes, ASCII)
            "SELECT doc_id, w.wi AS win_idx, AVG(ascii(substring(t.text, CAST(w.wi * 512 + c.ci + 1 AS BIGINT), 1))) AS mean_level "
            "FROM documents t, "
            "LATERAL (SELECT UNNEST(range(0, length(t.text) // 512)) AS wi) w, "
            "LATERAL (SELECT UNNEST(range(0, 512)) AS ci) c "
            "GROUP BY doc_id, w.wi"
        ),
        "audio_features_wav": (
            # the Ray side synthesizes s[i] = ((doc_id*131 + i*7919) % 65536)
            # - 32768 as PCM16, WAV-encodes, then REALLY decodes; the oracle
            # recomputes the generator in closed form per 512-sample window
            "WITH s AS ("
            "SELECT d.doc_id, w.wi, c.ci, "
            "CAST(((d.doc_id * 131 + (w.wi * 512 + c.ci) * 7919) % 65536) - 32768 AS DOUBLE) AS v, "
            "CASE WHEN c.ci > 0 THEN "
            "CAST(((d.doc_id * 131 + (w.wi * 512 + c.ci - 1) * 7919) % 65536) - 32768 AS DOUBLE) "
            "ELSE NULL END AS vp "
            "FROM documents d, "
            "LATERAL (SELECT UNNEST(range(0, 2 + d.doc_id % 3)) AS wi) w, "
            "LATERAL (SELECT UNNEST(range(0, 512)) AS ci) c) "
            "SELECT doc_id, wi AS win_idx, AVG(v) AS mean_amp, "
            "SQRT(AVG(v * v)) AS rms, "
            "CAST(SUM(CASE WHEN vp IS NOT NULL AND vp * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr, "
            "CAST(8000 AS BIGINT) AS sr "
            "FROM s GROUP BY doc_id, wi"
        ),
        "frame_sample": (
            # every 2nd 256-char frame; chars == bytes (ASCII corpus)
            "SELECT d.doc_id, f.fi AS frame_idx, "
            "substr(sha256(substring(d.text, f.fi * 256 + 1, 256)), 1, 16) AS frame_sha, "
            "CAST(256 AS BIGINT) AS frame_bytes "
            "FROM documents d, LATERAL ("
            "SELECT UNNEST(range(0, length(d.text) // 256, 2)) AS fi) f"
        ),
        "geohash": _geohash_sql(6),
        "choropleth": (
            f"WITH zones AS ({_ZONES_SQL}), pts AS ({_PTS_SQL}), "
            f"zc AS (SELECT z.zone_id, z.x0, z.y0, COUNT(*) AS n FROM zones z JOIN pts p ON "
            f"p.lon >= z.x0 AND p.lon <= z.x0 + {ZN_SIDE} AND p.lat >= z.y0 AND p.lat <= z.y0 + {ZN_SIDE} "
            f"GROUP BY z.zone_id, z.x0, z.y0), "
            f"pb AS (SELECT n, "
            f"CAST(floor((x0 + 180.0) / 360.0 * {CHORO_RES_X}) AS BIGINT) AS px0, "
            f"CAST(floor((x0 + {ZN_SIDE} + 180.0) / 360.0 * {CHORO_RES_X}) AS BIGINT) AS px1, "
            f"CAST(floor((y0 + 90.0) / 180.0 * {CHORO_RES_Y}) AS BIGINT) AS py0, "
            f"CAST(floor((y0 + {ZN_SIDE} + 90.0) / 180.0 * {CHORO_RES_Y}) AS BIGINT) AS py1 FROM zc) "
            f"SELECT gx.x AS pixel_x, gy.y AS pixel_y, CAST(SUM(n) AS DOUBLE) AS weight "
            f"FROM pb, UNNEST(range(px0 + 1, px1)) AS gx(x), UNNEST(range(py0 + 1, py1)) AS gy(y) "
            f"GROUP BY 1, 2"
        ),
        "scatter_zones": (
            f"WITH zones AS ({_ZONES_SQL}), "
            f"pb AS (SELECT zone_id, "
            f"CAST(floor((x0 + 180.0) / 360.0 * {CHORO_RES_X}) AS BIGINT) AS px0, "
            f"CAST(floor((x0 + {ZN_SIDE} + 180.0) / 360.0 * {CHORO_RES_X}) AS BIGINT) AS px1, "
            f"CAST(floor((y0 + 90.0) / 180.0 * {CHORO_RES_Y}) AS BIGINT) AS py0, "
            f"CAST(floor((y0 + {ZN_SIDE} + 90.0) / 180.0 * {CHORO_RES_Y}) AS BIGINT) AS py1 FROM zones), "
            f"edges AS ("
            f"SELECT zone_id, gx.x AS px, py0 AS py FROM pb, UNNEST(range(px0, px1 + 1)) gx(x) "
            f"UNION SELECT zone_id, gx.x, py1 FROM pb, UNNEST(range(px0, px1 + 1)) gx(x) "
            f"UNION SELECT zone_id, px0, gy.y FROM pb, UNNEST(range(py0, py1 + 1)) gy(y) "
            f"UNION SELECT zone_id, px1, gy.y FROM pb, UNNEST(range(py0, py1 + 1)) gy(y)) "
            f"SELECT px AS pixel_x, py AS pixel_y, CAST(COUNT(*) AS DOUBLE) AS weight "
            f"FROM edges GROUP BY 1, 2"
        ),
        "jaccard_pairs": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[]) "
            "WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) END AS s FROM toks), "
            "ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0) "
            "SELECT a, b, jac FROM ("
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jac "
            f"FROM ne a JOIN ne b ON a.doc_id < b.doc_id) WHERE jac >= {JAC_THRESHOLD}"
        ),
        "jaccard_pairs_ids": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[]) "
            "WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) END AS s FROM toks), "
            "ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0) "
            "SELECT a, b, jac FROM ("
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jac "
            f"FROM ne a JOIN ne b ON a.doc_id < b.doc_id) WHERE jac >= {JAC_THRESHOLD}"
        ),
        "image_decode_fake": (
            "WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents) "
            "SELECT doc_id, "
            "16 + CAST('0x' || substr(hx, 1, 2) AS BIGINT) % 64 AS img_width, "
            "16 + CAST('0x' || substr(hx, 3, 2) AS BIGINT) % 64 AS img_height, "
            "CAST(3 AS BIGINT) AS img_channels FROM h"
        ),
    }
    # the join-path scorer is exact and identical to the broadcast path —
    # one SQL oracle serves both
    out["collocations_join"] = out["collocations"]
    fs = _flagship_sql()
    if fs is not None:
        out["flagship_pages"] = fs
    for name in _FIXTURE_ORACLES:
        path = os.path.join(_FIXTURE_DIR, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = (
                f"SELECT * FROM read_parquet('{path}') "
                "-- golden fixture: generated once by scripts/gen_oracle_fixtures.py"
            )
    if "ann_topk_ivf" in out:
        # the IO-pruned probe returns bit-identical results to the masked
        # full scan (same lists, same exact cosine) — share the fixture
        out["ann_topk_ivf_pruned"] = out["ann_topk_ivf"]
    km_path = os.path.join(_FIXTURE_DIR, "kmeans_clusters.parquet")
    if os.path.exists(km_path):
        # hybrid: cluster ids from the kmeans fixture, the per-cluster
        # top-10 selection is closed-form SQL (window over cluster, id)
        out["diversity_sample"] = (
            "SELECT vec_id, cluster_id FROM ("
            "SELECT vec_id, cluster_id, "
            "row_number() OVER (PARTITION BY cluster_id ORDER BY vec_id) AS rn "
            f"FROM read_parquet('{km_path}')) WHERE rn <= 10"
        )
    return out
