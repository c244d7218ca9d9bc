#!/usr/bin/env python
"""Multimodal ingest pipeline: images + audio as opaque binary columns,
decoded and featurized by REAL pure-numpy codecs, written as partitioned
parquet — the end-to-end shape of a 100 TB media-corpus prep job.

    image payloads (PNG/JPEG)                audio payloads (RIFF/WAVE)
      -> DecodeImage(codec="auto")             -> AudioFeatures(codec="wav")
         (actor pool: dims + features)            (actor pool: per-window
      -> ResizeImage(codec="auto")                 mean/RMS/zero-crossings)
         (bilinear thumbnail re-encode)
      -> checkpointed partitioned parquet (resumable)

Payloads here are synthesized deterministically (the container has no
external media); on real data only the read changes. Undecodable payloads
become nulls (images) or are dropped (audio) — the FormatMapper
skip-invalid idiom.

Usage (local smoke):

    python examples/multimodal_pipeline.py --out /tmp/multimodal_prep

At cluster scale, submit via `ray job submit --working-dir .`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from incubator_sedona_ray.sources.multimodal import AudioFeatures, DecodeImage, ResizeImage
from incubator_sedona_ray.state.manifest import checkpointed_write


def synth_payloads(n_docs: int) -> "ray.data.Dataset":
    """Deterministic mixed payloads: PNG / JPEG images + WAV audio."""
    from incubator_sedona_ray.raster.jpeg import jpeg_encode
    from incubator_sedona_ray.raster.viz import png_encode_rgb
    from incubator_sedona_ray.sources.wav import wav_encode

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        img_blobs, wav_blobs = [], []
        for d in ids:
            d = int(d)
            w, h = 16 + d % 17, 12 + d % 11
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 7 + d) % 256, (yy * 13 + d) % 256, ((xx + yy) + d) % 256], axis=2
            ).astype(np.uint8)
            img_blobs.append(jpeg_encode(img, quality=80) if d % 2 else png_encode_rgb(img))
            i = np.arange(2048, dtype=np.int64)
            s = ((d * 131 + i * 7919) % 65536 - 32768).astype(np.int16)
            wav_blobs.append(wav_encode(s, sample_rate=16000))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "image": pa.array(img_blobs, type=pa.binary()),
                "audio": pa.array(wav_blobs, type=pa.binary()),
            }
        )

    return ray.data.range(n_docs).map_batches(make, batch_format="pyarrow", batch_size=256)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/multimodal_prep")
    ap.add_argument("--n-docs", type=int, default=2000)
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)

    docs = synth_payloads(args.n_docs)

    # image branch: decode (real codecs, magic-sniffed) -> thumbnail
    imgs = docs.select_columns(["doc_id", "image"]).map_batches(
        DecodeImage,
        fn_constructor_kwargs={"bin_col": "image", "codec": "auto", "feat_dim": 6},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    ).map_batches(
        ResizeImage,
        fn_constructor_kwargs={"codec": "auto", "bin_col": "image", "max_side": 16},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    ).drop_columns(["image", "resized_payload"])

    # audio branch: windowed features (one row per 512-sample window)
    aud = docs.select_columns(["doc_id", "audio"]).map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"bin_col": "audio", "codec": "wav", "window": 512},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((ids * np.int64(0x9E3779B1)) % 8 + 8) % 8
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    totals = {}
    for name, branch in (("image_meta", imgs), ("audio_windows", aud)):
        manifest = checkpointed_write(
            branch.map_batches(add_part, batch_format="pyarrow"),
            os.path.join(args.out, name),
            part_col="part",
            expected_parts=list(range(8)),
            lineage={"stage": "multimodal_prep", "branch": name},
        )
        totals[name] = sum(m["rows"] for m in manifest["metrics"])
    print(f"rows written: {totals} -> {args.out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
