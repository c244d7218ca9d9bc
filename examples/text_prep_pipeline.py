#!/usr/bin/env python
"""Training-data prep pipeline over Common-Crawl-style pages.

The canonical LLM-corpus cleaning chain, every stage a streaming Ray Data
transform (nothing materializes on the driver):

    read parquet (pruned columns)
      -> blocklist gate         (one RE2-alternation sweep, zero shuffles)
      -> language ID           (actor pool — model state per actor)
      -> quality score + filter (vectorized batch kernel)
      -> LM fluency filter      (stupid-backoff bigram LM, integer-exact —
                                 the CCNet-style perplexity gate)
      -> bloom incremental dedup (optional --seen snapshot, applied before
                                 any heavy compute: bloom misses stream
                                 free, only hits take the verify join)
      -> exact dedup            (sha256 -> Min-aggregate survivors -> hash join)
      -> MinHash near-dedup     (banded LSH -> star pairs -> distributed
                                 verify + connected components)
      -> duplicate-span removal (ExactSubstr: shared boilerplate n-grams
                                 cut out of the surviving docs)
      -> token count            (batch kernel)
      -> checkpointed partitioned parquet (per-partition _SUCCESS + manifest,
                                 resumable mid-run)

Usage (local smoke):

    python examples/text_prep_pipeline.py \
        --input /root/testdata/sf0.001/documents.parquet --out /tmp/text_prep

At cluster scale, submit the same file via `ray job submit --working-dir .`.
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from incubator_sedona_ray.dedup import dedup_exact, minhash_dedup
from incubator_sedona_ray.join.payload import attach_payload
from incubator_sedona_ray.state.manifest import checkpointed_write
from incubator_sedona_ray.text.analysis import LangId, quality_fn, token_count_fn


BLOCKED_TERMS = ["viagra", "xxx porn", "casino bonus"]


def build(
    input_path: str,
    min_alpha_ratio: float = 0.5,
    min_lm_score_fp: int = 0,
    seen_path: str | None = None,
):
    from incubator_sedona_ray.dedup.spans import remove_dup_spans
    from incubator_sedona_ray.text.backoff_lm import lm_score, ngram_lm_train
    from incubator_sedona_ray.text.blocklist import blocklist_clean

    docs = ray.data.read_parquet(input_path, columns=["doc_id", "text"])

    # 0. blocklist gate — one vectorized alternation sweep, clean rows
    # (the overwhelming majority) pass with zero further work
    docs = blocklist_clean(docs, BLOCKED_TERMS)

    # 0b. incremental dedup vs a prior snapshot (recrawl setting), FIRST:
    # previously-seen docs are dropped before any compute is spent on
    # them, and the bloom's two-pass split re-scans only the cheap
    # column-pruned read (bloom misses stream free; only the hit tail —
    # true overlap + ~FPR — takes the exact verify anti-join)
    if seen_path:
        from incubator_sedona_ray.sketch.bloom import bloom_anti_join

        seen = ray.data.read_parquet(seen_path, columns=["text"])
        # pin the gated delta: downstream stages make several passes
        # (LM train + score, dedup joins) and must not re-execute the
        # anti-join lineage each time. The delta is the NEW docs only —
        # small in a recrawl; a production run checkpoints it to parquet
        # here (state/manifest.checkpointed_write) instead
        docs = bloom_anti_join(docs, seen, col="text", num_bits=1 << 22).materialize()

    # 1. language ID — stateful stage, model built once per actor
    lang = docs.map_batches(LangId, concurrency=2, batch_format="pyarrow")

    # 2. quality scoring + filter (vectorized; drops low-alpha rows)
    scored = lang.map_batches(quality_fn(), batch_format="pyarrow")

    def keep_quality(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater_equal(batch["alpha_ratio"], min_alpha_ratio))

    good = scored.map_batches(keep_quality, batch_format="pyarrow")

    # 3. LM fluency gate: self-trained stupid-backoff bigram LM; drop docs
    # whose mean transition probability is below the threshold (CCNet's
    # perplexity filter, integer fixed-point)
    model = ngram_lm_train(good)
    lm = lm_score(good, model, mode="broadcast")
    fluent_ids = lm.filter(lambda r, _t=min_lm_score_fp: r["score_fp"] >= _t)
    good = attach_payload(fluent_ids.select_columns(["doc_id"]), good, key="doc_id", strategy="hash")

    # 4. exact dedup: survivors carry their text rows back via a hash join
    uniq = dedup_exact(good, keep_cols=["text", "lang_pred", "alpha_ratio"])

    # 5. near-dedup: minhash survivors (ids) filter the unique rows
    survivors, _pairs = minhash_dedup(uniq, threshold=0.85)
    kept = attach_payload(survivors.select_columns(["doc_id"]), uniq, key="doc_id", strategy="hash")

    # 6. duplicate-span removal: cut cross-doc boilerplate runs out of the
    # surviving docs (ExactSubstr); the cleaned text replaces `text`
    cleaned = remove_dup_spans(kept, n=4, min_docs=2)
    meta = kept.select_columns(["doc_id", "lang_pred", "alpha_ratio"])
    kept = attach_payload(
        cleaned.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "text": t["text_clean"]}),
            batch_format="pyarrow",
        ),
        meta,
        key="doc_id",
        strategy="hash",
    )

    # 7. token counts for the final corpus accounting
    counted = kept.map_batches(token_count_fn(), batch_format="pyarrow")
    return counted.select_columns(["doc_id", "lang_pred", "alpha_ratio", "n_tokens", "text"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--out", default="/tmp/text_prep")
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--seen", default=None, help="prior-snapshot parquet (text column) for incremental dedup")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    corpus = build(args.input, seen_path=args.seen)

    # partition by doc_id hash for a resumable, skew-free write
    def add_part(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((ids * np.int64(0x9E3779B1)) % args.parts + args.parts) % args.parts
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    manifest = checkpointed_write(
        corpus.map_batches(add_part, batch_format="pyarrow"),
        args.out,
        part_col="part",
        expected_parts=list(range(args.parts)),
        lineage={"stage": "text_prep", "input": args.input},
    )
    n = sum(m["rows"] for m in manifest["metrics"])
    print(f"wrote {n} rows across {len(manifest['completed'])} partitions -> {args.out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
