"""RIFF/WAVE codec round-trips + the real AudioFeatures(codec="wav") stage."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.sources.wav import wav_decode, wav_encode


def test_pcm16_mono_roundtrip():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1000, dtype=np.int16)
    out, sr = wav_decode(wav_encode(s, sample_rate=8000))
    assert sr == 8000 and out.shape == (1000, 1)
    assert np.array_equal(out[:, 0], s)


def test_pcm16_stereo_and_pcm8_and_pcm32():
    rng = np.random.default_rng(8)
    st = rng.integers(-1000, 1000, size=(64, 2), dtype=np.int16)
    out, _ = wav_decode(wav_encode(st))
    assert np.array_equal(out, st)
    u8 = rng.integers(0, 256, size=33, dtype=np.uint8)  # odd data size -> pad byte
    out8, _ = wav_decode(wav_encode(u8))
    assert out8.dtype == np.uint8 and np.array_equal(out8[:, 0], u8)
    i32 = rng.integers(-(1 << 30), 1 << 30, size=20, dtype=np.int32)
    out32, _ = wav_decode(wav_encode(i32))
    assert np.array_equal(out32[:, 0], i32)


def test_float32_roundtrip():
    s = np.linspace(-1, 1, 77, dtype=np.float32)
    out, _ = wav_decode(wav_encode(s, sample_rate=44100))
    assert out.dtype == np.float32 and np.array_equal(out[:, 0], s)


def test_pcm24_sign_extension():
    # hand-build a 24-bit file: frames 0x000001 (1), 0xFFFFFF (-1), 0x800000 (-2^23)
    data = bytes([0x01, 0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x80])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + 1)
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + b"\x00"
    )
    out, _ = wav_decode(blob)
    assert out[:, 0].tolist() == [1, -1, -(1 << 23)]


def test_extensible_tag_and_unknown_chunks_skipped():
    s = np.arange(-5, 5, dtype=np.int16)
    blob = bytearray(wav_encode(s))
    # splice a LIST chunk between WAVE and fmt: decoder must skip it
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    body = junk + bytes(blob[12:])
    spliced = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, _ = wav_decode(spliced)
    assert np.array_equal(out[:, 0], s)
    # extensible header: tag 0xFFFE + GUID whose leading bytes say PCM
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16
    ) + struct.pack("<HHI", 22, 16, 4) + struct.pack("<H", 1) + b"\x00\x00" + b"\x00" * 12
    data = np.array([3, -3], dtype="<i2").tobytes()
    blob2 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out2, _ = wav_decode(blob2)
    assert out2[:, 0].tolist() == [3, -3]


def test_malformed_raises():
    for bad in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", wav_encode(np.int16([1]))[:20]):
        with pytest.raises(ValueError):
            wav_decode(bad)


def test_audio_features_wav_stage():
    from incubator_sedona_ray.sources.multimodal import AudioFeatures

    w = 4
    # doc 1: 10 samples -> 2 full windows; doc 2: corrupt -> skipped
    s = np.array([100, -100, 200, -200, 0, 50, 50, -50, 7, 7], dtype=np.int16)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([wav_encode(s, sample_rate=8000), b"not a wav"], type=pa.binary()),
        }
    )
    out = AudioFeatures(codec="wav", window=w)(batch)
    assert out["doc_id"].to_pylist() == [1, 1]
    assert out["win_idx"].to_pylist() == [0, 1]
    win0 = s[:4].astype(np.float64)
    win1 = s[4:8].astype(np.float64)
    assert out["mean_amp"].to_pylist() == [win0.mean(), win1.mean()]
    assert out["rms"].to_pylist() == [
        np.sqrt((win0**2).mean()), np.sqrt((win1**2).mean())
    ]
    # zcr: win0 has 3 strict sign changes; win1: 0*50 is not strict, 50->-50 is 1
    assert out["zcr"].to_pylist() == [3, 1]
    assert out["sr"].to_pylist() == [8000, 8000]
    # on_error="raise" propagates
    with pytest.raises(ValueError):
        AudioFeatures(codec="wav", window=w, on_error="raise")(batch)


def test_audio_features_wav_stereo_downmix_exact():
    from incubator_sedona_ray.sources.multimodal import AudioFeatures

    st = np.array([[10, 20], [-10, -30], [5, 5], [1, 3]], dtype=np.int16)
    batch = pa.table(
        {
            "doc_id": pa.array([9], type=pa.int64()),
            "payload": pa.array([wav_encode(st)], type=pa.binary()),
        }
    )
    out = AudioFeatures(codec="wav", window=4)(batch)
    mono = st.astype(np.int64).sum(axis=1) / 2  # [15, -20, 5, 2]
    assert out["mean_amp"].to_pylist() == [mono.mean()]
    assert out["zcr"].to_pylist() == [2]


def test_audio_features_pcm8_centered():
    # PCM8 is offset-binary: digital silence (all 128) must yield zero
    # amplitude, and zero-crossings must fire on sign changes around 128
    from incubator_sedona_ray.sources.multimodal import AudioFeatures

    silent = np.full(8, 128, dtype=np.uint8)
    wavy = np.array([138, 118, 138, 118], dtype=np.uint8)  # +10,-10 swings
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([wav_encode(silent), wav_encode(wavy)], type=pa.binary()),
        }
    )
    out = AudioFeatures(codec="wav", window=4)(batch)
    assert out["mean_amp"].to_pylist() == [0.0, 0.0, 0.0]
    assert out["rms"].to_pylist()[0] == 0.0 and out["rms"].to_pylist()[2] == 10.0
    assert out["zcr"].to_pylist() == [0, 0, 3]
