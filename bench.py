#!/usr/bin/env python
"""Headline benchmark: the flagship spatial pipeline + key operators over
$GRAFT_SF_DIR, printed as ONE JSON line.

Because the driver tables are small (5k docs at sf0.1), the spatial stages
run over a deterministically EXPANDED page set (BENCH_EXPAND copies per
document, distinct urls/ids — same shape as BASELINE.json input_hint), so
the numbers reflect engine throughput, not fixture size.

Usage:
  python bench.py                # one run at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling      # fresh-process runs at 8 and 32 CPUs over
                                 # the SAME input; prints both + efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("BENCH_EXPAND", "400"))  # pages = docs * EXPAND
ONLY = set(q for q in os.environ.get("BENCH_ONLY", "").split(",") if q)
BATCH = 16384  # more tasks than CPUs so the pool saturates
REPEAT = int(os.environ.get("BENCH_REPEAT", "2"))  # best-of-N (noisy shared host; 2 = the config BASELINE.md documents)


PAGES_DIR = os.environ.get("BENCH_PAGES_DIR", "/tmp/graft_bench_pages")


def _pages_path(n: int) -> str:
    tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    return f"{PAGES_DIR}_{tag}_{n}"


def expanded_pages_raw(ray, n: int):
    """Deterministic page generator (n rows). ~50 pages per registrable
    domain like real web crawls, so the geocoder's per-domain cache is
    exercised realistically."""
    import ray.data as rd

    n_blocks = max(NCPU * 4, n // BATCH)
    tlds = ["com", "de", "fr", "jp", "br", "uk", "cn", "es", "it", "ru", "org", "net"]
    n_domains = max(1, n // 50)

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        urls = [
            f"https://site{int(i) % n_domains}.{tlds[(int(i) % n_domains) % len(tlds)]}/p/{int(i)}"
            for i in ids
        ]
        texts = [f"synthetic page body {int(i)} lorem ipsum dolor sit amet " * 2 for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    return rd.range(n, override_num_blocks=n_blocks).map_batches(
        make, batch_format="pyarrow", batch_size=BATCH
    )


def ensure_pages_parquet(ray, n_docs: int) -> str:
    """Materialize the synthetic page table to parquet ONCE (untimed,
    reused across runs and parallelism levels — the timed pipelines then
    measure read -> transform -> join like a real deployment)."""
    n = n_docs * EXPAND
    path = _pages_path(n)
    if not os.path.exists(os.path.join(path, "_DONE")):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        expanded_pages_raw(ray, n).write_parquet(path)
        with open(os.path.join(path, "_DONE"), "w") as fh:
            fh.write(str(n))
    return path


def expanded_pages(ray, n_docs: int, columns=None):
    """Timed input: the materialized parquet pages. Pass ``columns`` to
    prune at the read (a transform that needs 2 columns must not load 3).
    Block count pinned to 2 blocks/CPU: Ray's auto-split otherwise produces
    ~8k-row blocks whose per-task overhead dominates the fused chains."""
    return ray.data.read_parquet(
        ensure_pages_parquet(ray, n_docs), columns=columns,
        # BENCH_BLOCKS pins an absolute block count (the scaling protocol
        # sets it so BOTH parallelism levels see the same block layout —
        # a real cluster fixes block SIZE, not blocks-per-CPU; without it
        # the lower level gets larger blocks and better per-task
        # amortization, deflating measured scaling efficiency)
        override_num_blocks=int(os.environ.get("BENCH_BLOCKS", NCPU * 2)),
    )


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from incubator_sedona_ray.encoders import s2 as _s2
    from incubator_sedona_ray.join.broadcast import broadcast_spatial_join
    from incubator_sedona_ray.join import spatial_join
    from incubator_sedona_ray.pipelines.pages import country_zones_table
    from incubator_sedona_ray.raster.tile import tile_assign_batch_fn, heatmap_counts
    from incubator_sedona_ray.text.geocode import geocode_batch
    import __ray_entry__ as entrymod

    n_docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"]).count()
    n_pages = n_docs * EXPAND
    ensure_pages_parquet(ray, n_docs)  # untimed one-time input materialization
    results: dict[str, float] = {}
    rates: dict[str, float] = {}

    # warm-up (untimed): OS page cache + EVERY worker process in the pool.
    # Two per-process one-time costs would otherwise pollute timed runs:
    # module imports (~0.5 s) and OpenBLAS init on the first matmul-family
    # call (~3 s with this DYNAMIC_ARCH build). Spawn >= 2*NCPU concurrent
    # tasks that import our stages AND touch a tiny matmul.
    ray.data.read_parquet(f"{SF_DIR}/documents.parquet").count()

    def warm_fn(batch: pa.Table) -> pa.Table:
        m = np.ones((4, 4))
        _ = m @ m  # trigger OpenBLAS init once per worker
        return pa.table(
            {"doc_id": batch["id"], "url": pa.array([f"https://w{int(i)}.com/" for i in batch["id"].to_numpy()])}
        )

    _warm = (
        ray.data.range(NCPU * 2 * 8192, override_num_blocks=NCPU * 2)
        .map_batches(warm_fn, batch_format="pyarrow", batch_size=8192)
        .map_batches(geocode_batch, batch_format="pyarrow")
        .map_batches(tile_assign_batch_fn((-180.0, -90.0, 180.0, 90.0), 64, 32, 2, 2), batch_format="pyarrow")
    )
    _warm.count()

    import threading

    import ray.data as _rd

    qstats: dict[str, dict] = {}

    def _consume(x):
        """Execute a query result: Datasets are streamed to exhaustion on
        THEIR OWN plan (ref bundles only — no block fetch to the driver;
        ``count()`` would execute a copied plan and leave ``x``'s stats
        empty) and kept for stats extraction; ints pass through."""
        if isinstance(x, _rd.Dataset):
            for _ in x.iter_internal_ref_bundles():
                pass
            return x
        return None

    def _ds_stats(ds) -> dict:
        """Per-stage output bytes from Ray Data's structured stats:
        total output MB, per-shuffle-operator output MB (the all-to-all
        exchanges: Aggregate/Sort/Shuffle/Repartition), and spill."""
        try:
            summ = ds._plan.stats().to_summary()
        except Exception:
            return {}
        ops = []

        def walk(s):
            ops.extend(s.operators_stats)
            for p in s.parents:
                walk(p)

        walk(summ)
        shuffle: dict[str, float] = {}
        total_b = 0
        for o in ops:
            try:
                b = int((o.output_size_bytes or {}).get("sum") or 0)
            except Exception:
                b = 0
            total_b += b
            nm = o.operator_name
            if any(k in nm for k in ("Aggregate", "Sort", "Shuffle", "Repartition")):
                shuffle[nm] = round(shuffle.get(nm, 0.0) + b / 1e6, 2)
        out = {"out_mb": round(total_b / 1e6, 2)}
        if shuffle:
            out["shuffle_out_mb"] = shuffle
        spilled = getattr(summ, "dataset_bytes_spilled", 0) or 0
        if spilled:
            out["spilled_mb"] = round(spilled / 1e6, 2)
        return out

    class _StorePeak:
        """Samples cluster object-store availability during a timed run;
        peak usage = capacity - min(available)."""

        def __init__(self):
            self.total = ray.cluster_resources().get("object_store_memory", 0.0)
            self.min_avail = self.total
            self._stop = threading.Event()
            self._t = threading.Thread(target=self._run, daemon=True)

        def _run(self):
            while not self._stop.wait(0.05):
                try:
                    a = ray.available_resources().get("object_store_memory")
                except Exception:
                    continue
                if a is not None and a < self.min_avail:
                    self.min_avail = a

        def __enter__(self):
            self._t.start()
            return self

        def __exit__(self, *exc):
            self._stop.set()
            self._t.join(timeout=1.0)

        @property
        def peak_mb(self) -> float:
            return round((self.total - self.min_avail) / 1e6, 2)

    def timed(name, fn, rows=None, warm_fn_=None):
        if ONLY and name not in ONLY:
            return None
        # warm the exact fused chain shape once (first execution of a chain
        # pays per-worker closure/library init; steady state is what a
        # long-running 100 TB job sees)
        if warm_fn_ is not None:
            warm_fn_()
        else:
            _consume(fn())
        dt = None
        last_ds = None
        with _StorePeak() as peak:
            for _ in range(max(1, REPEAT)):
                t0 = time.perf_counter()
                ds = _consume(fn())
                d = time.perf_counter() - t0
                if dt is None or d < dt:
                    dt = d
                if ds is not None:
                    last_ds = ds
        results[name] = round(dt, 3)
        if rows:
            rates[name + "_rows_per_s"] = round(rows / dt)
        st = _ds_stats(last_ds) if last_ds is not None else {}
        st["store_peak_mb"] = peak.peak_mb
        qstats[name] = st
        return dt

    WORLD = (-180.0, -90.0, 180.0, 90.0)

    # q1: flagship — pages -> geocode -> s2 -> broadcast PIP -> tile (no shuffle)
    def _q1_ds(limit=None):
        pages = expanded_pages(ray, n_docs)
        if limit:
            pages = pages.limit(limit)
        geo = pages.map_batches(geocode_batch, batch_format="pyarrow")

        def cells(b: pa.Table) -> pa.Table:
            c = _s2.cells_for_points(
                b["lon"].to_numpy(zero_copy_only=False), b["lat"].to_numpy(zero_copy_only=False), 10
            )
            return b.append_column("s2_cell", pa.array(c))

        withc = geo.map_batches(cells, batch_format="pyarrow")
        joined = broadcast_spatial_join(
            withc, country_zones_table(), "covered_by", big_geom=("lon", "lat"), small_geom="geom", how="left_outer", small_prefix="z_", small_columns=["zone_cc"],
        )
        return joined.map_batches(tile_assign_batch_fn(WORLD, 1024, 512, 8, 8), batch_format="pyarrow")

    timed(
        "q1_flagship_pages",
        lambda: _q1_ds(),
        rows=n_pages,
        warm_fn_=lambda: _q1_ds(limit=NCPU * BATCH).count(),
    )

    # q2: partitioned PIP join (the shuffle path) over expanded points
    def q2():
        from incubator_sedona_ray.geom import Geometry
        from incubator_sedona_ray.geom.wkb import to_wkb

        zones_rows = []
        for xi in range(18):
            for yi in range(9):
                x0, y0 = -180.0 + 20.0 * xi, -90.0 + 20.0 * yi
                zones_rows.append({"zone_id": xi * 9 + yi, "geom": to_wkb(Geometry.box(x0, y0, x0 + 15.0, y0 + 15.0))})
        zones = ray.data.from_pandas(pd.DataFrame(zones_rows))
        pts = expanded_pages(ray, n_docs, columns=["doc_id", "url"]).map_batches(geocode_batch, batch_format="pyarrow").select_columns(["doc_id", "lon", "lat"])
        joined = spatial_join(
            zones, pts, "covers", left_geom="geom", right_geom=("lon", "lat"),
            num_partitions=max(8, NCPU), boundary=WORLD,  # known boundary -> block-sample fit, no full summary pass
        )
        return joined

    timed("q2_partitioned_pip_join", q2, rows=n_pages)

    # q3: tile assignment rate (the north-rule tile metric, isolated)
    def q3():
        pts = expanded_pages(ray, n_docs, columns=["doc_id", "url"]).map_batches(geocode_batch, batch_format="pyarrow")
        return pts.map_batches(tile_assign_batch_fn(WORLD, 1024, 512, 8, 8), batch_format="pyarrow")

    timed("q3_tile_assign", q3, rows=n_pages)

    # q4: heatmap per-pixel aggregation (partial-aggregate + small shuffle)
    def q4():
        pts = expanded_pages(ray, n_docs, columns=["doc_id", "url"]).map_batches(geocode_batch, batch_format="pyarrow")
        return heatmap_counts(pts, WORLD, 256, 128, 4, 4)

    timed("q4_heatmap", q4, rows=n_pages)

    # q5: exact dedup over the real documents table
    def q5():
        from incubator_sedona_ray.dedup import dedup_exact

        return dedup_exact(ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]))

    timed("q5_dedup_exact", q5, rows=n_docs)

    # q6: ANN brute top-k over embeddings
    def q6():
        from incubator_sedona_ray.ann import topk_cosine

        ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        # pick the 8 query vectors WITHOUT materializing the table on the
        # driver: sort+limit streams and ships only 8 rows back
        qdf = (
            ds.sort("vec_id")
            .limit(8)
            .to_pandas()
            .rename(columns={"vec_id": "query_id", "embedding": "qvec"})
        )
        return topk_cosine(ds, qdf, k=10)

    timed("q6_ann_topk", q6)

    # q7: distance join on a thinned expanded point set
    def q7():
        def thin(b: pa.Table) -> pa.Table:
            # hash-thin, NOT stride-thin: a stride aliases with the pages
            # generator's domain cycle and lands 50 rows on each surviving
            # coordinate -> quadratic self-join output
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ids * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(33)
            return b.filter(pa.array((h % np.uint64(50)) == 0))

        # thin BEFORE geocode: every spatial_join pass re-executes this
        # chain, so the predicate must be pushed ahead of the transform
        thinned = (
            expanded_pages(ray, n_docs, columns=["doc_id", "url"])
            .map_batches(thin, batch_format="pyarrow")
            .map_batches(geocode_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "lon", "lat"])
        )
        # radius sized to the country-box point density (~46 pts/deg^2 in the
        # densest boxes): 0.1 deg keeps the output near-linear in the input
        joined = spatial_join(
            thinned, thinned, radius=0.1, left_geom=("lon", "lat"), right_geom=("lon", "lat"),
            num_partitions=max(8, NCPU), boundary=WORLD,
        )
        return joined

    timed("q7_distance_join", q7, rows=n_pages // 50)

    # q8: EXACT n-gram-Jaccard all-pairs dedup (prefix-filtered
    # set-similarity self-join, df-ordered prefixes) over the documents table
    def q8():
        from incubator_sedona_ray.dedup import jaccard_self_join

        docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        return jaccard_self_join(docs, threshold=0.35, order="df")

    timed("q8_jaccard_pairs", q8, rows=n_docs)

    # q9: broadcast join with a polygon-WKB BIG side (per-page footprint
    # boxes x zone polygons) — exercises the batch WKB envelope scanner and
    # the vectorized polygon-x-polygon refine instead of the point fast path
    def q9():
        from incubator_sedona_ray.geom.wkb import boxes_to_wkb

        def boxify(b: pa.Table) -> pa.Table:
            lon = b["lon"].to_numpy(zero_copy_only=False)
            lat = b["lat"].to_numpy(zero_copy_only=False)
            w = boxes_to_wkb(lon - 0.25, lat - 0.25, lon + 0.25, lat + 0.25)
            return pa.table({"doc_id": b["doc_id"], "geom": pa.array(list(w), type=pa.binary())})

        boxes = (
            expanded_pages(ray, n_docs, columns=["doc_id", "url"])
            .map_batches(geocode_batch, batch_format="pyarrow")
            .map_batches(boxify, batch_format="pyarrow")
        )
        joined = broadcast_spatial_join(
            boxes, country_zones_table(), "intersects",
            big_geom="geom", small_geom="geom", how="inner", small_columns=["zone_cc"],
        )
        return joined

    timed("q9_wkb_poly_broadcast", q9, rows=n_pages)

    # q10: vector-ops chain over the embeddings table — distributed k-means
    # codebooks, PQ uint8 encode (32x compression), LUT shortlist + exact
    # re-rank (the 100TB similarity-search memory path)
    def q10():
        import pandas as pd

        from incubator_sedona_ray.ann import pq_encode, pq_fit, pq_topk

        ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        books = pq_fit(ds, m=8, n_codes=32, iters=3)
        enc = pq_encode(ds, books)
        head = ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], 8)), batch_format="pyarrow"
        ).to_pandas()
        queries = head.sort_values("vec_id").rename(columns={"vec_id": "query_id", "embedding": "qvec"})
        return pq_topk(enc, queries, books, k=10, rerank_ds=ds, expand=5)

    timed("q10_pq_ann", q10, rows=2000)

    # q11: REAL baseline-JPEG decode throughput (pure-numpy T.81 codec) —
    # payloads synthesized+materialized up front so the timed section is
    # the actor-pool decode alone (the multimodal ingest path)
    n_imgs = 4000

    def _q11_payloads():
        from incubator_sedona_ray.raster.jpeg import jpeg_encode

        def to_payload(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            blobs = []
            for i in ids:
                w, h = 24 + int(i) % 17, 16 + int(i) % 11
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(xx * 7 + int(i)) % 256, (yy * 13 + int(i)) % 256, ((xx + yy) + int(i)) % 256],
                    axis=2,
                ).astype(np.uint8)
                blobs.append(jpeg_encode(img, quality=80))
            return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(blobs, type=pa.binary())})

        return (
            ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
            .map_batches(lambda t: t.filter(pa.compute.less(t["doc_id"], n_imgs)), batch_format="pyarrow")
            .map_batches(to_payload, batch_format="pyarrow")
            .materialize()
        )

    payloads = None
    if not ONLY or "q11_jpeg_decode" in ONLY:
        payloads = _q11_payloads()

    def q11():
        from incubator_sedona_ray.sources.multimodal import DecodeImage

        return payloads.map_batches(
            DecodeImage,
            fn_constructor_kwargs={"bin_col": "payload", "codec": "jpeg", "feat_dim": 6},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=NCPU // 2,
            num_cpus=2,
        )

    timed("q11_jpeg_decode", q11, rows=n_imgs)

    # q12: REAL RIFF/WAVE decode + windowed features (pure-numpy codec) —
    # payloads synthesized+materialized up front; timed section is the
    # actor-pool decode + window-reduce alone
    n_wavs = 20000

    def _q12_payloads():
        from incubator_sedona_ray.sources.wav import wav_encode

        def to_payload(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            blobs = []
            for d in ids:
                d = int(d)
                n = 4096 + (d % 5) * 1024
                i = np.arange(n, dtype=np.int64)
                s = ((d * 131 + i * 7919) % 65536 - 32768).astype(np.int16)
                blobs.append(wav_encode(s, sample_rate=8000))
            return pa.table({"doc_id": batch["doc_id"], "payload": pa.array(blobs, type=pa.binary())})

        return (
            ray.data.range(n_wavs, override_num_blocks=NCPU * 2)
            .map_batches(lambda t: pa.table({"doc_id": t["id"]}), batch_format="pyarrow")
            .map_batches(to_payload, batch_format="pyarrow")
            .materialize()
        )

    wav_payloads = None
    if not ONLY or "q12_wav_decode" in ONLY:
        wav_payloads = _q12_payloads()

    def q12():
        from incubator_sedona_ray.sources.multimodal import AudioFeatures

        return wav_payloads.map_batches(
            AudioFeatures,
            fn_constructor_kwargs={"codec": "wav", "window": 512},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=NCPU // 2,
            num_cpus=2,
        )

    timed("q12_wav_decode", q12, rows=n_wavs)

    # q13: the text-prep chain over the full page corpus — PII scrub (3 RE2
    # passes) + repetition scores (split/dict-encode/lexsort) fused into one
    # map stage, then URL canonicalize + keep-latest dedup (1 shuffle of the
    # slim url/ts/canon projection; the text column is NOT shipped)
    def q13():
        from incubator_sedona_ray.text.redact import redact_batch
        from incubator_sedona_ray.text.repetition import repetition_batch
        from incubator_sedona_ray.text.urls import dedup_urls

        def prep(b: pa.Table) -> pa.Table:
            b = repetition_batch(redact_batch(b))
            return b.drop_columns(["text"])  # wide-row rule: scores only past this point

        scored = expanded_pages(ray, n_docs, columns=["doc_id", "url", "text"]).map_batches(
            prep, batch_format="pyarrow", batch_size=BATCH
        )

        def add_ts(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            base = np.datetime64("2024-01-01T00:00:00", "us")
            ts = base + (ids % 86400).astype("timedelta64[s]").astype("timedelta64[us]")
            return b.append_column("warc_ts", pa.array(ts))

        return dedup_urls(scored.map_batches(add_ts, batch_format="pyarrow"), num_parts=NCPU * 2)

    timed("q13_textprep", q13, rows=n_pages)

    # q14: html -> text extraction over the full page corpus — wrap each
    # page body in realistic chrome (title/style/script/comment), then the
    # vectorized RE2 strip chain re-derives the body text (the north-star
    # byte-identity stage). Stateless, zero shuffle.
    def q14():
        from incubator_sedona_ray.text.extract import extract_text_batch

        pre = (
            "<html><head><title>t</title><style>p{margin:0}</style></head>"
            "<body><script>var n=1;</script><!-- warc --><p>"
        )
        post = "</p></body></html>"

        def wrap_and_extract(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            html = pc.binary_join_element_wise(pre, b["text"], post, "")
            t = pa.table({"doc_id": b["doc_id"], "html": html})
            return extract_text_batch(t, "html", "etext").select(["doc_id", "etext"])

        return (
            expanded_pages(ray, n_docs, columns=["doc_id", "text"])
            .map_batches(wrap_and_extract, batch_format="pyarrow", batch_size=BATCH)
        )

    timed("q14_html_extract", q14, rows=n_pages)

    # q15: BM25 retrieval over the full page corpus — stats pass (partial
    # aggregates only) + broadcast-idf score pass with mergeable local
    # top-k: two streaming reads, no shuffle.
    def q15():
        from incubator_sedona_ray.text.bm25 import bm25_topk

        ds = expanded_pages(ray, n_docs, columns=["doc_id", "text"])
        return bm25_topk(ds, ["lorem", "synthetic", "body"], 25)

    timed("q15_bm25", q15, rows=2 * n_pages)  # two passes over the corpus

    # q16: corpus-wide top-20 bigrams — map-side np.unique combine, then a
    # groupby shuffle bounded by DISTINCT bigrams, then mergeable top-k.
    def q16():
        from incubator_sedona_ray.text.ngrams import top_ngrams

        ds = expanded_pages(ray, n_docs, columns=["text"])
        return top_ngrams(ds, n=2, k=20)

    timed("q16_top_bigrams", q16, rows=n_pages)

    # q17: exact global quantiles of page length — 3 histogram passes, no
    # sort shuffle (the streaming replacement for ds.sort + rank lookup).
    def q17():
        from incubator_sedona_ray.sketch import quantiles_exact

        ds = expanded_pages(ray, n_docs, columns=["text"]).map_batches(
            lambda b: pa.table(
                {"n_chars": pa.compute.utf8_length(b["text"]).cast(pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=BATCH,
        )
        got = quantiles_exact(ds, "n_chars", [0.25, 0.5, 0.9, 0.99])
        return len(got)

    timed("q17_quantiles", q17, rows=3 * n_pages)  # three passes

    # q18: PageRank, 3 damped rounds over a 3-out-regular synthetic link
    # graph on the page ids — the iterative-shuffle workload class (one
    # edges-x-ranks hash join + one node-keyed groupby per round).
    def q18():
        from incubator_sedona_ray.graph.pagerank import pagerank

        n = n_pages

        def mk_edges(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            src = np.repeat(ids, 3)
            j = np.tile(np.array([1, 2, 3], dtype=np.int64), len(ids))
            dst = (src * 7 + j * 13) % n
            return pa.table(
                {
                    "src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64()),
                }
            )

        pages_ids = expanded_pages(ray, n_docs, columns=["doc_id"])
        edges = pages_ids.map_batches(mk_edges, batch_format="pyarrow", batch_size=BATCH)
        nodes = pages_ids.map_batches(
            lambda b: pa.table({"node": b["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow",
            batch_size=BATCH,
        )
        return pagerank(edges, nodes, iters=3, n_nodes=n)

    # 3 rounds x (3n edge join rows + n node rows) + the setup passes
    timed("q18_pagerank", q18, rows=3 * (4 * n_pages))

    # q18b: PageRank with the BSP two-range-exchange mode FORCED — the
    # 100 TB path (node state sharded, no dense driver vector); the
    # scaling protocol runs this to evidence the SHUFFLED path's N-vs-4N
    # efficiency, not just the shuffle-free flagship.
    def q18b():
        from incubator_sedona_ray.graph.pagerank import pagerank

        n = n_pages

        def mk_edges(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            src = np.repeat(ids, 3)
            j = np.tile(np.array([1, 2, 3], dtype=np.int64), len(ids))
            dst = (src * 7 + j * 13) % n
            return pa.table(
                {
                    "src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64()),
                }
            )

        pages_ids = expanded_pages(ray, n_docs, columns=["doc_id"])
        edges = pages_ids.map_batches(mk_edges, batch_format="pyarrow", batch_size=BATCH)
        nodes = pages_ids.map_batches(
            lambda b: pa.table({"node": b["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow",
            batch_size=BATCH,
        )
        # range count PINNED (not CPU-derived): the scaling protocol needs
        # both parallelism levels to see the SAME exchange layout — a real
        # cluster sizes ranges by graph size, not worker count. Iteration
        # count is tunable so the scaling run can weight the per-round
        # exchange (the steady state of a real 10-50 round PageRank) over
        # the one-time setup.
        return pagerank(
            edges,
            nodes,
            iters=int(os.environ.get("BENCH_PR_ITERS", "3")),
            n_nodes=n,
            mode="bsp",
            num_partitions=int(os.environ.get("BENCH_BSP_RANGES", "32")),
        )

    # BSP at this node count is the deliberately-oversized exchange (the
    # dense mode exists precisely to avoid it below 4M nodes), so it runs
    # only when explicitly requested (the scaling protocol asks for it)
    if "q18b_pagerank_bsp" in ONLY:
        timed(
            "q18b_pagerank_bsp",
            q18b,
            rows=int(os.environ.get("BENCH_PR_ITERS", "3")) * (4 * n_pages),
        )

    # q19: distributed BPE training, 5 merges — the iterative vocab-table
    # workload in OVERFLOW (distributed) mode: one corpus pass for word
    # freqs, then 5 x (pair-count pass + merge-apply pass) over the
    # ~2M-distinct-word symbol table.
    def q19():
        from incubator_sedona_ray.text.bpe import bpe_train

        ds = expanded_pages(ray, n_docs, columns=["text"])
        return len(bpe_train(ds, 5, mode="distributed"))

    timed("q19_bpe_train", q19, rows=n_pages)

    # q19b: DEEP BPE training, 1000 merges, memory mode (the production
    # path for real 30k-vocab tokenizers): one distributed word-freq pass,
    # then the incremental in-driver merge loop. The documents table's
    # word inventory is tiny (31 words), so the word stream is the
    # deterministic 8-char shingle decomposition of the real text — a
    # 12k-distinct-word table that supports 1000+ genuine merges.
    def q19b():
        from incubator_sedona_ray.text.bpe import bpe_train

        docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])

        def shingle(t: pa.Table) -> pa.Table:
            out = []
            for s in t["text"].to_pylist():
                s = s.lower()
                out.append(
                    " ".join(
                        s[i : i + 8].replace(" ", "_")
                        for i in range(0, max(1, len(s) - 7), 4)
                    )
                )
            return pa.table({"text": out})

        df = bpe_train(docs.map_batches(shingle, batch_format="pyarrow"), 1000, mode="memory")
        assert len(df) == 1000
        return len(df)

    timed("q19b_bpe_deep_train", q19b, rows=1000)  # rows = merges learned

    # q20: stupid-backoff LM train + score over the full expanded page
    # corpus — the CCNet-style fluency gate: two fnv-bucketed count
    # passes (vocabulary-bounded tables), then ONE zero-shuffle scoring
    # pass (broadcast index_in lookups), integer-exact end to end.
    def q20():
        from incubator_sedona_ray.text.backoff_lm import lm_score, ngram_lm_train

        pages = expanded_pages(ray, n_docs, columns=["doc_id", "text"])
        model = ngram_lm_train(pages)
        out = lm_score(pages, model, mode="broadcast")
        return out.map_batches(
            lambda b: pa.table({"n": pa.array([b.num_rows], type=pa.int64())}),
            batch_format="pyarrow",
        ).sum("n")

    # train (2 passes) + score (1 pass) over the page table
    timed("q20_lm_score", q20, rows=3 * n_pages)

    # q21: TPC-H Q21 over the sf tables — the heaviest relational shape in
    # the suite (big-big lineitem x orders hash join, per-(order,supplier)
    # max rollup, per-order triple aggregate, broadcast name attach).
    def q21():
        out = entrymod.q_tpch_q21(SF_DIR)
        return out.count()

    n_lineitem = ray.data.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"]
    ).count()
    timed("q21_tpch_q21", q21, rows=n_lineitem)

    # q22: DSIR selection over the full expanded page corpus (broadcast
    # mode): two fnv-bucketed count passes + one zero-shuffle scoring pass
    # + mergeable top-k — the CCNet/DSIR-style data-selection gate.
    def q22():
        from incubator_sedona_ray.text.dsir import dsir_select

        pages = expanded_pages(ray, n_docs, columns=["doc_id", "text"])
        target = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
        out = dsir_select(pages, target, 100)
        return out.count()

    timed("q22_dsir_select", q22, rows=3 * n_pages)

    # q23: bloom-prefiltered exact anti-join over the full page corpus —
    # seen snapshot = every 3rd page's url; misses (2/3 of the corpus)
    # stream with zero shuffles, only the hit tail takes the verify join.
    def q23():
        from incubator_sedona_ray.sketch.bloom import bloom_anti_join

        pages = expanded_pages(ray, n_docs, columns=["doc_id", "url"])

        def _seen(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0
            return b.filter(pa.array(m))

        seen = pages.map_batches(_seen, batch_format="pyarrow").select_columns(["url"])
        out = bloom_anti_join(pages, seen, col="url", num_bits=1 << 24)
        return out.count()

    timed("q23_bloom_dedup", q23, rows=2 * n_pages)

    # q24: hashed TF-IDF sparse vectors over the full page corpus — the
    # per-page numeric tokens make the vocabulary ~n_pages wide, so the df
    # shuffle and the broadcast idf table run at realistic cardinality.
    def q24():
        from incubator_sedona_ray.text.tfidf import hashed_tfidf

        pages = expanded_pages(ray, n_docs, columns=["doc_id", "text"])
        out = hashed_tfidf(pages, dim=1 << 18, scale=10**4)
        return out.map_batches(
            lambda b: pa.table({"n": pa.array([b.num_rows], type=pa.int64())}),
            batch_format="pyarrow",
        ).sum("n")

    timed("q24_hashed_tfidf", q24, rows=2 * n_pages)

    # q25: SemDeDup over the sf embeddings table + planted scaled dups —
    # seed-cosine clustering (k=64) then the within-cluster prune matmul.
    def q25():
        from incubator_sedona_ray.dedup.semdedup import semdedup

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        import __ray_entry__ as _e

        inp = emb.map_batches(_e._synth_scaled_dups_fn, batch_format="pyarrow")
        return semdedup(inp, k=64, tau=0.8).count()

    n_emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id"]).count()
    timed("q25_semdedup", q25, rows=n_emb)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "flagship pages pipeline wall time (read->geocode->s2->PIP join->tile)",
        "value": results.get("q1_flagship_pages", total),
        "unit": "sec",
        "queries": results,
        "rates": rates,
        "stats": qstats,
        "pages_rows": n_pages,
        "total_sec": total,
        "sf": SF_DIR,
        "num_cpus": NCPU,
    }
    ray.shutdown()
    return out


def _control_unit(_):
    """Fixed pure-numpy work unit for the NO-RAY hardware control: measures
    the host's parallel-efficiency ceiling (frequency scaling, shared cache,
    cgroup throttling) independent of the engine."""
    rng = np.random.default_rng(0)
    x = rng.random(500_000)
    s = 0.0
    for _ in range(20):
        s += float(np.sin(x).sum())
        x = (x * 1.0000001) % 1.0
    return s


def _control_unit_mem(_):
    """Memory-bandwidth control unit: one BSP range's per-round kernel mix
    (permuted int64 gather over a larger-than-L3 working set, integer
    divide, reduceat, big copy). Iterative graph rounds are bandwidth-
    bound, not ALU-bound — judging their scaling against the sin() unit
    would compare against the wrong hardware ceiling (this host's memory
    subsystem saturates at far fewer cores than its ALUs)."""
    rng = np.random.default_rng(0)
    n = 2_000_000
    r = rng.integers(1, 10**12, n)
    perm = rng.permutation(n)
    starts = np.arange(0, n, 37)
    s = None
    for _ in range(6):
        c = r[perm] // 3
        s = np.add.reduceat(c, starts)
        r = np.roll(r, 1)
    return int(s[0])


def control_efficiency(lo: int, hi: int, units: int | None = None, kind: str = "alu"):
    """Run ``units`` identical numpy work units through a multiprocessing
    Pool at lo and hi workers (interleaved, min-of-2 each) and return
    (efficiency, t_lo, t_hi). This is the hardware-achievable ceiling on
    this box — engine scaling should be judged against it. ``kind`` picks
    the resource class the measured pipeline actually binds on: "alu"
    (compute-heavy: geometry, joins) or "mem" (bandwidth-heavy: iterative
    graph rounds)."""
    import multiprocessing as mp

    unit = _control_unit_mem if kind == "mem" else _control_unit
    units = units or hi * (4 if kind == "mem" else 16)
    times: dict[int, float] = {}
    for n in (lo, hi, lo, hi):
        t0 = time.perf_counter()
        with mp.get_context("fork").Pool(n) as p:
            p.map(unit, range(units), chunksize=1)
        dt = time.perf_counter() - t0
        times[n] = min(times.get(n, 1e18), dt)
    eff = (times[lo] / times[hi]) / (hi / lo)
    return round(eff, 3), round(times[lo], 2), round(times[hi], 2)


def run_scaling():
    """Fresh-process runs of the flagship pipeline at 8 and 32 CPUs over the
    SAME (larger) input; efficiency computed on the headline q1 wall time.
    The input is sized (BENCH_SCALING_EXPAND) so the 8-CPU run is compute-
    bound — scaling numbers on an overhead-bound toy input are meaningless.
    A no-Ray numpy control job measures the host's own parallel-efficiency
    ceiling; the normalized efficiency (engine/control) is what a dedicated
    cluster would see."""
    scaling_expand = os.environ.get("BENCH_SCALING_EXPAND", "8000")
    trials = int(os.environ.get("BENCH_SCALING_TRIALS", "4"))
    lo = int(os.environ.get("BENCH_SCALING_LO", "8"))
    hi = int(os.environ.get("BENCH_SCALING_HI", "32"))
    # BENCH_SCALING_ONLY picks the query set; the FIRST name is the
    # primary whose wall time defines the efficiency (default: the
    # flagship; set e.g. "q2_partitioned_pip_join" or
    # "q18b_pagerank_bsp" to measure the shuffled paths)
    only = os.environ.get("BENCH_SCALING_ONLY", "q1_flagship_pages,q3_tile_assign")
    primary = only.split(",")[0]

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_EXPAND=scaling_expand,
            BENCH_ONLY=only,
            BENCH_REPEAT=os.environ.get("BENCH_REPEAT", "2"),
            # same block layout at both levels: only the worker count
            # varies between the runs. 8 blocks/CPU at the high level —
            # measured A/B: per-task wall varies ~1.7x on this host, so
            # fine blocks smooth stragglers at 32 CPUs (6.3s vs 7.7s with
            # 2 blocks/CPU) while costing nothing at 8 (18.1 vs 17.8)
            BENCH_BLOCKS=os.environ.get("BENCH_BLOCKS", str(hi * 8)),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # the sandbox host's effective CPU speed swings 2-3x minute-to-minute,
    # so interleave trials (lo, hi, lo, hi, ...) and take the per-level MIN
    # — the canonical way to measure compute scaling on a noisy shared box.
    # BENCH_SCALING_LO/HI pick the N-vs-4N pair: the default 8/32 exercises
    # the full machine, but the no-Ray control shows this host's own
    # parallel efficiency COLLAPSES above ~16 active cores (control 0.885
    # at 4->16 vs 0.75 at 8->32 in the same hour) — 4/16 measures the
    # engine below the host's contention knee
    r_lo = r_hi = None
    for _ in range(max(1, trials)):
        a, b = run(lo), run(hi)
        if r_lo is None or a["queries"][primary] < r_lo["queries"][primary]:
            r_lo = a
        if r_hi is None or b["queries"][primary] < r_hi["queries"][primary]:
            r_hi = b
    t_lo = r_lo["queries"][primary]
    t_hi = r_hi["queries"][primary]
    eff = (t_lo / t_hi) / (hi / lo)
    # control kernel matched to the primary's binding resource:
    # graph rounds are bandwidth-bound, everything else ALU-bound
    ctrl_kind = os.environ.get(
        "BENCH_CONTROL", "mem" if "pagerank_bsp" in primary else "alu"
    )
    ctrl_eff, ctrl_lo, ctrl_hi = control_efficiency(lo, hi, kind=ctrl_kind)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency ({primary} sec, {lo} vs {hi} CPUs, same input)",
                "value": round(eff, 3),
                "unit": "efficiency",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "per_query_8": r_lo["queries"],
                "per_query_32": r_hi["queries"],
                # the compact subset stdout line carries no rates/stats
                # (they live in the full-suite sidecar) — tolerate both
                "rates_8": r_lo.get("rates", {}),
                "rates_32": r_hi.get("rates", {}),
                "pages_rows": r_lo["pages_rows"],
                "scaling_efficiency": round(eff, 3),
                "control_efficiency": ctrl_eff,
                "control_kind": ctrl_kind,
                "control_sec_8": ctrl_lo,
                "control_sec_32": ctrl_hi,
                "normalized_efficiency": round(min(eff / ctrl_eff, 1.0), 3) if ctrl_eff else None,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        out = run_bench()
        # Full detail (per-query rates + shuffle/object-store stats) goes
        # to a sidecar file; stdout gets ONE compact JSON line. The
        # driver's stdout tail capture is bounded (~3 KB) — round-4's
        # stats-laden line overflowed it and the driver recorded
        # "parsed": null, so the stats block lives in BENCH_DETAIL.json.
        # Subset runs (BENCH_ONLY set — e.g. the scaling subprocesses)
        # must not overwrite the full-suite sidecar.
        if not os.environ.get("BENCH_ONLY"):
            try:
                with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as fh:
                    json.dump(out, fh, indent=1)
            except OSError:
                pass
        compact = {k: v for k, v in out.items() if k not in ("rates", "stats")}
        compact["queries"] = {k: round(v, 3) for k, v in compact["queries"].items()}
        print(json.dumps(compact))
