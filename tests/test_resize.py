"""Bilinear resample kernel + the real-pixel ResizeImage stage."""
import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.raster.resize import fit_box, resize_bilinear


def test_identity_resize():
    img = (np.arange(24).reshape(4, 6) * 10).astype(np.uint8)
    assert np.array_equal(resize_bilinear(img, 4, 6), img)


def test_downscale_2x_is_neighbor_average():
    # 2x2 -> 1x1 with half-pixel centers: the single output pixel sits at
    # the exact center and averages all four inputs
    img = np.array([[0, 100], [200, 100]], dtype=np.uint8)
    out = resize_bilinear(img, 1, 1)
    assert out.shape == (1, 1)
    assert out[0, 0] == 100  # (0+100+200+100)/4
    # 4x4 constant stays constant at any size
    const = np.full((4, 4, 3), 77, dtype=np.uint8)
    assert np.array_equal(resize_bilinear(const, 3, 2), np.full((3, 2, 3), 77, dtype=np.uint8))


def test_upscale_interpolates_monotone():
    ramp = np.array([[0.0, 10.0]])
    out = resize_bilinear(ramp, 1, 4)
    assert out.shape == (1, 4)
    assert np.all(np.diff(out[0]) >= 0) and out[0, 0] == 0.0 and out[0, 3] == 10.0


def test_float_roundtrip_and_errors():
    img = np.random.default_rng(1).random((5, 7))
    out = resize_bilinear(img, 3, 3)
    assert out.dtype == np.float64
    with pytest.raises(ValueError):
        resize_bilinear(img, 0, 3)


def test_fit_box():
    assert fit_box(100, 50, 32) == (32, 16)
    assert fit_box(10, 10, 32) == (10, 10)  # never upscale
    assert fit_box(2000, 3, 32) == (32, 1)  # 1px floor


def test_resize_image_stage_real_pixels():
    from incubator_sedona_ray.raster.png import png_decode
    from incubator_sedona_ray.raster.viz import png_encode_rgb
    from incubator_sedona_ray.sources.multimodal import ResizeImage

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([png_encode_rgb(img), b"junk"], type=pa.binary()),
        }
    )
    out = ResizeImage(max_side=10, codec="png")(batch)
    assert out["resized_width"].to_pylist() == [10, None]
    assert out["resized_height"].to_pylist() == [6, None]  # floor(20*10/30)
    thumb = png_decode(out["resized_payload"][0].as_py())
    assert thumb.shape == (6, 10, 3)
    # thumbnail really is the bilinear resample of the source pixels
    from incubator_sedona_ray.raster.resize import resize_bilinear as rb

    assert np.array_equal(thumb, rb(img, 6, 10))
    with pytest.raises(ValueError):
        ResizeImage(max_side=10, codec="png", on_error="raise")(batch)


def test_resize_image_stage_metadata_mode_unchanged():
    from incubator_sedona_ray.sources.multimodal import ResizeImage

    batch = pa.table({"img_width": pa.array([100]), "img_height": pa.array([40])})
    out = ResizeImage(max_side=10)(batch)
    assert out["resized_width"].to_pylist() == [10]
    assert out["resized_height"].to_pylist() == [4]
