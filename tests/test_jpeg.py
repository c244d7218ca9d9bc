"""Baseline JPEG codec (raster/jpeg.py).

The hand-built golden constructs a minimal 8x8 JPEG byte-by-byte from the
ITU-T T.81 spec (Annex K canonical Huffman assignment computed by hand),
so the decoder is validated independently of the repo's own encoder."""

import struct

import numpy as np
import pytest

from incubator_sedona_ray.raster.jpeg import jpeg_decode, jpeg_encode, DC_LUMA, AC_LUMA


def _handmade_dc_only_jpeg() -> bytes:
    """8x8 grayscale, quant table all ones, single block with DC diff 64
    and EOB. By hand: DC category 7 -> Annex-K luma DC symbol 7 = code
    11110 (5 bits); magnitude bits 1000000 (7 bits); AC EOB = code 1010
    (4 bits). Total 16 bits = 0xF4 0x0A. IDCT of a DC-only block:
    every pixel = 64/8 + 128 = 136 exactly."""
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    for tc, (bits, huffval) in ((0, DC_LUMA), (1, AC_LUMA)):
        seg = bytes([(tc << 4) | 0]) + bytes(bits) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += bytes([0xF4, 0x0A])
    out += b"\xff\xd9"
    return bytes(out)


class TestDecoder:
    def test_handmade_dc_only_block(self):
        img = jpeg_decode(_handmade_dc_only_jpeg())
        assert img.shape == (8, 8)
        assert (img == 136).all()

    def test_rejects_progressive_and_garbage(self):
        with pytest.raises(ValueError):
            jpeg_decode(b"\x89PNG not a jpeg")
        data = bytearray(_handmade_dc_only_jpeg())
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC2  # flip SOF0 -> SOF2 progressive
        with pytest.raises(ValueError, match="baseline"):
            jpeg_decode(bytes(data))

    def test_truncated_raises(self):
        with pytest.raises(ValueError):
            jpeg_decode(_handmade_dc_only_jpeg()[:30])


class TestRoundTrip:
    def test_flat_gray_exact(self):
        img = np.full((16, 16), 128, dtype=np.uint8)
        assert (jpeg_decode(jpeg_encode(img, quality=90)) == img).all()

    def test_flat_color_420_exact_means(self):
        img = np.zeros((24, 17, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 200, 100, 50
        dec = jpeg_decode(jpeg_encode(img, quality=95))
        assert dec.shape == (24, 17, 3)
        for c, want in enumerate((200, 100, 50)):
            assert abs(float(dec[:, :, c].mean()) - want) <= 1.0

    @pytest.mark.parametrize("subsample", [False, True])
    def test_gradient_tolerance(self, subsample):
        x = np.linspace(0, 255, 64)
        img = np.stack(
            [np.tile(x, (48, 1)), np.tile(x[::-1], (48, 1)), np.full((48, 64), 77.0)], axis=2
        ).astype(np.uint8)
        dec = jpeg_decode(jpeg_encode(img, quality=95, subsample=subsample))
        maxerr = np.abs(dec.astype(int) - img.astype(int)).max()
        assert maxerr <= (6 if subsample else 2)

    def test_noise_psnr_reasonable(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(img, quality=90, subsample=False))
        mse = float(((dec.astype(float) - img.astype(float)) ** 2).mean())
        psnr = 10 * np.log10(255.0**2 / mse)
        assert psnr > 25.0

    def test_odd_sizes_and_gray(self):
        rng = np.random.default_rng(4)
        for shape in [(9, 13), (8, 8), (23, 31, 3), (7, 40, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            dec = jpeg_decode(jpeg_encode(img, quality=92, subsample=False))
            assert dec.shape[:2] == img.shape[:2]

    def test_low_quality_still_decodes(self):
        img = np.full((16, 24, 3), 90, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(img, quality=5))
        assert np.abs(dec.astype(int) - 90).mean() < 20


class TestDecodeImageJpeg:
    def test_stage_decodes_real_jpeg(self):
        import pyarrow as pa

        from incubator_sedona_ray.sources.multimodal import DecodeImage

        img = np.zeros((12, 10, 3), dtype=np.uint8)
        img[:, :, 0] = 250
        blob = jpeg_encode(img, quality=95)
        out = DecodeImage(codec="jpeg", feat_dim=6)(
            pa.table({"payload": pa.array([blob, b"bogus"], type=pa.binary())})
        )
        assert out["img_width"].to_pylist() == [10, None]
        assert out["img_height"].to_pylist() == [12, None]
        feats = out["img_features"].to_pylist()[0]
        assert feats[0] > 0.9 and feats[1] < 0.2 and feats[2] < 0.2
