"""Tile stitching (ImageStitcher.java parity) + the pure-numpy PNG decoder."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.raster.png import png_decode
from incubator_sedona_ray.raster.viz import png_encode_rgb, render_tiles, stitch_tiles


class TestPngDecode:
    def test_roundtrip_own_encoder(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode_rgb(img)), img)

    def _encode_with_filters(self, img: np.ndarray, ftype: int) -> bytes:
        """Re-encode forcing a specific scanline filter on every row."""
        h, w, c = img.shape
        rows = img.reshape(h, w * c).astype(np.int64)
        out = bytearray()
        prev = np.zeros(w * c, dtype=np.int64)
        for r in range(h):
            line = rows[r]
            if ftype == 0:
                enc = line
            elif ftype == 1:
                left = np.concatenate([np.zeros(c, dtype=np.int64), line[:-c]])
                enc = (line - left) & 0xFF
            elif ftype == 2:
                enc = (line - prev) & 0xFF
            elif ftype == 3:
                left = np.concatenate([np.zeros(c, dtype=np.int64), line[:-c]])
                enc = (line - ((left + prev) >> 1)) & 0xFF
            elif ftype == 4:
                enc = np.zeros_like(line)
                for i in range(w * c):
                    a = line[i - c] if i >= c else 0
                    b = prev[i]
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc)
                    enc[i] = (line[i] - pred) & 0xFF
            out += bytes([ftype]) + bytes(enc.astype(np.uint8))
            prev = line
        raw = zlib.compress(bytes(out))

        def chunk(tag, data):
            return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_filter_types(self, ftype):
        rng = np.random.default_rng(ftype)
        img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
        assert np.array_equal(png_decode(self._encode_with_filters(img, ftype)), img)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            png_decode(b"JFIF not a png")


class TestDecodeImagePng:
    def test_real_png_decode_exact_features(self):
        from incubator_sedona_ray.sources.multimodal import DecodeImage

        img = np.zeros((4, 5, 3), dtype=np.uint8)
        img[:, :, 0] = 255  # pure red
        stage = DecodeImage(codec="png", feat_dim=6)
        out = stage(pa.table({"payload": pa.array([png_encode_rgb(img)], type=pa.binary())}))
        assert out["img_width"].to_pylist() == [5]
        assert out["img_height"].to_pylist() == [4]
        assert out["img_channels"].to_pylist() == [3]
        feats = out["img_features"].to_pylist()[0]
        assert abs(feats[0] - 1.0) < 1e-12 and abs(feats[1]) < 1e-12 and abs(feats[2]) < 1e-12

    def test_corrupt_payload_null_vs_raise(self):
        from incubator_sedona_ray.sources.multimodal import DecodeImage

        good = png_encode_rgb(np.full((2, 2, 3), 7, dtype=np.uint8))
        batch = pa.table({"payload": pa.array([good, good[:20], b"junk"], type=pa.binary())})
        out = DecodeImage(codec="png", on_error="null")(batch)
        assert out["img_width"].to_pylist() == [2, None, None]
        assert out["img_features"].to_pylist()[1] is None
        with pytest.raises(ValueError):
            DecodeImage(codec="png", on_error="raise")(batch)

    def test_unknown_codec_and_default_stubbed(self):
        from incubator_sedona_ray.sources.multimodal import DecodeImage

        with pytest.raises(NotImplementedError):
            DecodeImage(codec="webp")
        with pytest.raises(NotImplementedError):
            DecodeImage()


class TestStitch:
    @pytest.mark.parametrize("blur", [0, 1])
    def test_stitched_equals_full_render(self, ray_session, blur):
        """The 4x2-tile render stitched back together must be PIXEL-IDENTICAL
        to rendering the whole image as one tile (halo exchange makes the
        per-tile blur exact, and stitching must not shift/flip anything)."""
        rng = np.random.default_rng(42)
        n = 4000
        px = rng.integers(0, 64, size=n)
        py = rng.integers(0, 32, size=n)
        pixels = ray.data.from_arrow(
            pa.table({"pixel_x": px, "pixel_y": py, "weight": np.ones(n)})
        )
        mw = 16.0
        tiles = render_tiles(pixels, 64, 32, 4, 2, blur_radius=blur, max_weight=mw)
        stitched = stitch_tiles(tiles, 64, 32, 4, 2).take_all()
        assert len(stitched) == 1
        got = png_decode(stitched[0]["png"])
        full = render_tiles(pixels, 64, 32, 1, 1, blur_radius=blur, max_weight=mw).take_all()
        want = png_decode(full[0]["png"])
        assert got.shape == want.shape == (32, 64, 3)
        assert np.array_equal(got, want)
