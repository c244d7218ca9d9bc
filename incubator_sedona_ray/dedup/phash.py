"""Perceptual image dedup: dHash fingerprints over real decoded pixels +
the shared banded-hamming dedup tail.

The image analogue of text SimHash dedup — the core near-dup primitive a
multimodal training corpus needs. Per image: decode (the repo's pure-numpy
PNG/JPEG codecs — no PIL), Rec.601 luma, bilinear resample to
(hash_size, hash_size+1), then the classic difference hash (each bit =
left pixel < right neighbour, row-major) packs into 64 bits for
hash_size=8. Two images within a few bits of hamming distance are crops /
re-encodes / slight edits of each other.

Stage shape: ``ImageDHash`` is an actor-pool ``map_batches`` class (decode
state constructed once per actor; small batches — payloads are large);
:func:`dhash_dedup` reuses :func:`..simhash.fingerprint_dedup` — 4x16-bit
band buckets, star pairs, exact-hamming verify, min-label components,
left-anti survivors join; nothing materializes on the driver.

Undecodable payloads (truncated files, unknown magic) emit a null hash and
are EXCLUDED from dedup (they can't be perceptual dups of anything) but
kept in the survivors universe — the FormatMapper skip-invalid idiom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def dhash64(img: np.ndarray, hash_size: int = 8) -> int:
    """(H, W[, C]) uint8 image -> 64-bit difference hash (row-major bits,
    bit i set iff resized[r, c] < resized[r, c+1])."""
    from ..raster.resize import resize_bilinear

    if img.ndim == 3:
        # Rec.601 luma in float — resize in float for precision
        luma = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    else:
        luma = img.astype(np.float64)
    small = resize_bilinear(luma.astype(np.float64), hash_size, hash_size + 1)
    bits = (small[:, :-1] < small[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0]) if hash_size == 8 else int(
        sum(np.uint64(1) << np.uint64(i) for i, b in enumerate(bits) if b)
    )


class ImageDHash:
    """Actor-pool stage: (id, payload binary) batches -> (id, dhash int64).

    ``codec``: 'png' | 'jpeg' | 'auto' (magic sniff). Undecodable payloads
    yield a null dhash (skip-invalid)."""

    def __init__(self, bin_col: str = "payload", id_col: str = "doc_id", codec: str = "auto", hash_size: int = 8):
        from ..raster.jpeg import jpeg_decode
        from ..raster.png import png_decode

        if codec not in ("png", "jpeg", "auto"):
            raise NotImplementedError(
                f"codec {codec!r}: 'png', 'jpeg' and 'auto' decode natively; other formats "
                "need external libs absent from this container"
            )
        self.bin_col, self.id_col, self.codec, self.hash_size = bin_col, id_col, codec, hash_size
        self._png, self._jpeg = png_decode, jpeg_decode

    def _decode(self, blob: bytes) -> np.ndarray | None:
        try:
            if self.codec == "png" or (self.codec == "auto" and blob[:8] == b"\x89PNG\r\n\x1a\n"):
                return self._png(blob)
            if self.codec == "jpeg" or (self.codec == "auto" and blob[:2] == b"\xff\xd8"):
                return self._jpeg(blob)
            return None
        except Exception:
            return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for blob in batch[self.bin_col].to_pylist():
            img = self._decode(blob) if blob is not None else None
            hashes.append(
                None if img is None else np.int64(np.uint64(dhash64(img, self.hash_size)))
            )
        return pa.table(
            {self.id_col: batch[self.id_col], "dhash": pa.array(hashes, type=pa.int64())}
        )


def dhash_dedup(
    ds,
    *,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    max_hamming: int = 3,
    concurrency: int | None = None,
    batch_size: int = 64,
):
    """Dataset of (id, image payload) -> (survivors, pairs) Datasets via
    dHash + the shared banded-hamming tail. Decode runs in an actor pool
    (state once per actor, small batches for large payloads)."""
    from .simhash import fingerprint_dedup

    from ..partition.assign import default_pool

    fps = ds.map_batches(
        ImageDHash,
        fn_constructor_kwargs={"bin_col": bin_col, "id_col": id_col, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling (1, N) pool, NOT a fixed count: a fixed pool the size
        # of the cluster pins every CPU and starves the downstream banded
        # groupby shuffle (observed: 4 actors @ 4 CPUs -> near-livelock)
        concurrency=concurrency or default_pool(),
    )
    hashed = fps.map_batches(
        lambda t: t.filter(pc.is_valid(t["dhash"])), batch_format="pyarrow"
    )
    return fingerprint_dedup(
        hashed, ds, id_col=id_col, hash_col="dhash", max_hamming=max_hamming
    )
