"""Pure-numpy RIFF/WAVE PCM codec (stdlib ``struct`` + numpy only).

Implements the public WAVE file format (Microsoft/IBM RIFF spec,
"Multimedia Programming Interface and Data Specifications 1.0"):

* canonical PCM (format tag 1) at 8 (unsigned), 16, 24 and 32 bits,
* IEEE float (format tag 3) at 32 and 64 bits,
* WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) resolved through its SubFormat GUID,
* any channel count, proper chunk walking (word-aligned sizes, unknown
  chunks such as ``LIST``/``fact``/``cue `` skipped).

This makes the multimodal :class:`~.multimodal.AudioFeatures` stage REAL
end-to-end — the reference treats audio payloads as opaque binaries decoded
by external libraries; here the decode itself is native so no codec library
is needed.
"""

from __future__ import annotations

import struct

import numpy as np

# format tags (public RIFF/WAVE constants)
_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a sample array as a canonical RIFF/WAVE file.

    ``samples``: shape ``(n,)`` (mono) or ``(n, channels)``. dtype picks the
    format: ``uint8`` -> PCM8 (offset-binary), ``int16`` -> PCM16,
    ``int32`` -> PCM32, ``float32``/``float64`` -> IEEE float32.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    n, ch = arr.shape
    if arr.dtype == np.uint8:
        tag, bits, data = _WAVE_FORMAT_PCM, 8, arr.astype("<u1").tobytes()
    elif arr.dtype == np.int16:
        tag, bits, data = _WAVE_FORMAT_PCM, 16, arr.astype("<i2").tobytes()
    elif arr.dtype == np.int32:
        tag, bits, data = _WAVE_FORMAT_PCM, 32, arr.astype("<i4").tobytes()
    elif arr.dtype in (np.float32, np.float64):
        tag, bits, data = _WAVE_FORMAT_IEEE_FLOAT, 32, arr.astype("<f4").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {arr.dtype}")
    block_align = ch * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", tag, ch, sample_rate, byte_rate, block_align, bits)
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
            b"" if len(data) % 2 == 0 else b"\x00",
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE blob -> ``(samples, sample_rate)``.

    ``samples`` has shape ``(n, channels)``; dtype is the container's native
    width (uint8 / int16 / int32 for PCM 8/16/32, int32 for PCM24 after sign
    extension, float32 / float64 for IEEE float). Raises ``ValueError`` on
    malformed input.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16 or len(body) < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == _WAVE_FORMAT_EXTENSIBLE:
                # cbSize(2) + validBits(2) + channelMask(4) + SubFormat GUID;
                # the GUID's leading 2 bytes are the real format tag
                if size < 40 or len(body) < 26:
                    raise ValueError("extensible fmt chunk too short")
                (subtag,) = struct.unpack("<H", body[24:26])
                fmt = (subtag,) + fmt[1:]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    tag, ch, sample_rate, _byte_rate, _block_align, bits = fmt
    if ch < 1:
        raise ValueError(f"invalid channel count {ch}")
    if tag == _WAVE_FORMAT_PCM:
        if bits == 8:
            flat = np.frombuffer(data, dtype="<u1")
        elif bits == 16:
            flat = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) // 3 * 3], dtype="<u1").reshape(-1, 3)
            flat = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            flat = np.where(flat >= 1 << 23, flat - (1 << 24), flat).astype(np.int32)
        elif bits == 32:
            flat = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            flat = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4")
        elif bits == 64:
            flat = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8")
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAVE format tag 0x{tag:04x}")
    n = len(flat) // ch
    return flat[: n * ch].reshape(n, ch), sample_rate
