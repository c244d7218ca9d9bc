"""Pure-stdlib RIFF/AVI (Motion-JPEG) container codec.

Implements the public AVI RIFF form (Microsoft "AVI RIFF File Reference"):
``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc*)
idx1?)``. Only what a frame sampler needs:

* :func:`avi_decode_frames` walks the ``movi`` LIST and yields the
  compressed video chunks (``##dc`` / ``##db`` for stream 0) in stream
  order — for an MJPG stream each chunk is a complete baseline JPEG that
  the repo's pure-numpy ``raster/jpeg.py`` codec can decode.
* :func:`avi_encode` builds a minimal spec-conformant MJPG AVI from a list
  of JPEG blobs (used by tests / benches to synthesize inputs).

Together with ``raster/jpeg.py`` this makes the multimodal
:class:`~.multimodal.SampleFrames` stage REAL end-to-end for MJPEG video —
the reference delegates container parsing to external libraries; none are
available in this environment.
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"" if len(body) % 2 == 0 else b"\x00"
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def avi_encode(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
) -> bytes:
    """Minimal MJPG AVI: one video stream, ``frames`` are complete JPEG
    blobs written as ``00dc`` chunks, plus a standard ``idx1`` index."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    # avih: MainAVIHeader (56 bytes)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,                # dwReserved
    )
    # strh: AVIStreamHeader (56 bytes): fccType 'vids', handler 'MJPG',
    # dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
    # dwStart, dwLength, dwSuggestedBufferSize, dwQuality, dwSampleSize,
    # rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    # strf: BITMAPINFOHEADER with biCompression 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one AVIINDEXENTRY per chunk; offsets are relative to the start
    # of the movi LIST's 'movi' fourcc (the common convention)
    entries = []
    off = 4
    for f in frames:
        entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))  # AVIIF_KEYFRAME
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode_frames(blob: bytes, stream: int = 0) -> list[bytes]:
    """Walk the AVI and return the compressed chunks of video ``stream``
    (``##dc``/``##db``) in order. Raises ``ValueError`` on malformed input."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    want = {b"%02ddc" % stream, b"%02ddb" % stream}
    frames: list[bytes] = []
    saw_movi = False
    end = min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal saw_movi
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST" and size >= 4:
                ltype = blob[body_start : body_start + 4]
                if ltype == b"movi":
                    saw_movi = True
                walk(body_start + 4, body_end, in_movi or ltype == b"movi")
            elif in_movi and cid in want:
                frames.append(blob[body_start:body_end])
            pos = body_start + size + (size & 1)

    walk(12, end, False)
    if not saw_movi:
        raise ValueError("no movi LIST found")
    return frames
