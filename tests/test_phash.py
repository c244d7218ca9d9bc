"""Perceptual image dedup (dedup/phash.py): dHash invariances, decode
fallback, and the end-to-end actor-pool dedup."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.dedup.phash import ImageDHash, dhash64, dhash_dedup
from incubator_sedona_ray.dedup.simhash import hamming
from incubator_sedona_ray.raster.viz import png_encode_rgb


def _noise(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    from incubator_sedona_ray.dedup.sample import fmix32

    px = fmix32(np.arange(h * w * 3, dtype=np.uint64) + np.uint64(seed * 7919))
    return (px % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)


def _ham(a: int, b: int) -> int:
    return int(hamming(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0])


def test_identical_images_hash_equal():
    img = _noise(1)
    assert dhash64(img) == dhash64(img.copy())


def test_brightness_shift_invariant():
    # dHash compares neighbours, so a uniform clipped-free shift is a no-op
    img = _noise(2) // 2  # headroom so +10 never clips
    assert dhash64(img) == dhash64(img + 10)


def test_small_edit_small_hamming():
    img = _noise(3)
    edited = img.copy()
    edited[:2, :2] = np.clip(edited[:2, :2].astype(np.int64) + 30, 0, 255).astype(np.uint8)
    assert 0 <= _ham(dhash64(img), dhash64(edited)) <= 8


def test_different_images_far():
    assert _ham(dhash64(_noise(4)), dhash64(_noise(5))) > 10


def test_inversion_flips_all_bits():
    img = _noise(6)
    assert _ham(dhash64(img), dhash64(255 - img)) == 64


def test_grayscale_input():
    g = _noise(7)[:, :, 0]
    assert isinstance(dhash64(g), int)


def test_resize_invariance():
    # the same image at 2x resolution hashes within a few bits
    from incubator_sedona_ray.raster.resize import resize_bilinear

    img = _noise(8, 16, 16)
    big = resize_bilinear(img, 32, 32)
    assert _ham(dhash64(img), dhash64(big)) <= 10


def test_actor_stage_null_on_garbage():
    st = ImageDHash()
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([b"not an image", png_encode_rgb(_noise(9))], type=pa.binary()),
        }
    )
    out = st(t)
    assert out["dhash"][0].as_py() is None
    assert out["dhash"][1].as_py() is not None


def test_dedup_end_to_end(ray_session):
    imgs = []
    for g in range(10):
        base = _noise(100 + g)
        imgs.append(base)  # id 3g
        imgs.append(base.copy())  # id 3g+1: exact dup
        imgs.append(255 - base)  # id 3g+2: far
    t = pa.table(
        {
            "doc_id": pa.array(range(len(imgs)), type=pa.int64()),
            "payload": pa.array([png_encode_rgb(i) for i in imgs], type=pa.binary()),
        }
    )
    survivors, pairs = dhash_dedup(ray.data.from_arrow(t), max_hamming=3)
    sv = set(survivors.to_pandas()["doc_id"])
    for g in range(10):
        assert 3 * g in sv and 3 * g + 1 not in sv and 3 * g + 2 in sv
    pdf = pairs.to_pandas()
    assert len(pdf) == 10 and (pdf["ham"] == 0).all()
