"""RIFF/AVI (MJPG) container round-trips + the real SampleFrames stage."""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.sources.avi import avi_decode_frames, avi_encode


def _mk_jpegs(n, seed=0, w=24, h=16):
    from incubator_sedona_ray.raster.jpeg import jpeg_encode

    out = []
    for k in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 3 + k + seed) % 256, (yy * 5 + k) % 256, ((xx + yy) * 2 + k) % 256], axis=2
        ).astype(np.uint8)
        out.append(jpeg_encode(img, quality=80))
    return out


def test_avi_roundtrip():
    frames = _mk_jpegs(5)
    blob = avi_encode(frames, width=24, height=16, fps=10)
    got = avi_decode_frames(blob)
    assert got == frames


def test_avi_odd_sized_frames_padded():
    # odd-length chunks get a pad byte that must NOT leak into the frame
    frames = [b"\xff\xd8odd\xff\xd9", b"\xff\xd8even\xff\xd9"]
    assert len(frames[0]) % 2 == 1
    got = avi_decode_frames(avi_encode(frames, 8, 8))
    assert got == frames


def test_avi_malformed_raises():
    for bad in (b"", b"RIFF\x00\x00\x00\x00WAVE", b"RIFF\x10\x00\x00\x00AVI \x00" * 2):
        with pytest.raises(ValueError):
            avi_decode_frames(bad)


def test_jpeg_dims_header_scan():
    from incubator_sedona_ray.sources.multimodal import _jpeg_dims

    (frame,) = _mk_jpegs(1, w=40, h=24)
    assert _jpeg_dims(frame) == (40, 24)
    with pytest.raises(ValueError):
        _jpeg_dims(b"not a jpeg")


def test_sample_frames_mjpeg_avi_stage():
    from incubator_sedona_ray.sources.multimodal import SampleFrames

    frames = _mk_jpegs(7, seed=3)
    blob = avi_encode(frames, width=24, height=16)
    batch = pa.table(
        {
            "doc_id": pa.array([5, 6], type=pa.int64()),
            "payload": pa.array([blob, b"garbage"], type=pa.binary()),
        }
    )
    out = SampleFrames(codec="mjpeg-avi", stride=2, decode_dims=True)(batch)
    # doc 5: frames 0,2,4,6 sampled; doc 6: skipped (undecodable)
    assert out["doc_id"].to_pylist() == [5, 5, 5, 5]
    assert out["frame_idx"].to_pylist() == [0, 2, 4, 6]
    assert out["frame_sha"].to_pylist() == [
        hashlib.sha256(frames[i]).hexdigest()[:16] for i in (0, 2, 4, 6)
    ]
    assert out["frame_bytes"].to_pylist() == [len(frames[i]) for i in (0, 2, 4, 6)]
    assert out["frame_w"].to_pylist() == [24] * 4
    assert out["frame_h"].to_pylist() == [16] * 4
    with pytest.raises(ValueError):
        SampleFrames(codec="mjpeg-avi", on_error="raise")(batch)


def test_sample_frames_mjpeg_pixels_decodable():
    # the sampled chunks really are decodable JPEGs (full pixel decode)
    from incubator_sedona_ray.raster.jpeg import jpeg_decode

    frames = _mk_jpegs(2)
    got = avi_decode_frames(avi_encode(frames, 24, 16))
    img = jpeg_decode(got[1])
    assert img.shape == (16, 24, 3)


def test_strh_is_56_bytes():
    # AVIStreamHeader is 56 bytes; a miscount shifts rcFrame for external
    # parsers even though the repo's own decoder ignores strh
    import struct

    blob = avi_encode([b"\xff\xd8x\xff\xd9"], width=10, height=8)
    i = blob.index(b"strh")
    (size,) = struct.unpack("<I", blob[i + 4 : i + 8])
    assert size == 56
    body = blob[i + 8 : i + 8 + size]
    assert body[:4] == b"vids" and body[4:8] == b"MJPG"
    # rcFrame right/bottom are the last two words
    assert struct.unpack("<4H", body[48:56]) == (0, 0, 10, 8)


def test_jpeg_dims_with_fill_bytes():
    from incubator_sedona_ray.sources.multimodal import _jpeg_dims

    (frame,) = _mk_jpegs(1, w=30, h=20)
    # legal 0xFF fill byte inserted after SOI must not derail the scan
    padded = frame[:2] + b"\xff" + frame[2:]
    assert _jpeg_dims(padded) == (30, 20)
