"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

PNG, baseline JPEG and RIFF/WAVE audio decode FOR REAL via the repo's
pure-numpy codecs (``raster/png.py``, ``raster/jpeg.py``,
``sources/wav.py`` — stdlib zlib/struct only): ``DecodeImage(codec="png"
| "jpeg" | "auto")``, ``AudioFeatures(codec="wav")``. Compressed video /
audio containers need libs absent from this container (ffmpeg) — those
modes are STUBBED per the driver brief: they raise ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decode stands in.
The Ray-side plumbing — actor-pool stage, schema, small batch sizes for
large binary payloads — is real and tested in every mode.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa


def payload_meta_fn(bin_col: str = "payload", prefix: str = ""):
    """Vectorized metadata extraction over a binary column: byte length +
    8-byte sha256 prefix (as hex) — cheap, exact, SQL-mirrorable."""

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch[bin_col].to_pylist()
        n = pa.array([len(b) if b is not None else 0 for b in blobs], type=pa.int64())
        digest = pa.array(
            [hashlib.sha256(b).hexdigest()[:16] if b is not None else None for b in blobs],
            type=pa.string(),
        )
        return batch.append_column(prefix + "n_bytes", n).append_column(prefix + "sha_prefix", digest)

    return fn


def _jpeg_dims(blob: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG's SOF marker — a cheap header scan, no
    entropy decode. Raises ``ValueError`` if no frame header is found."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            pos += 2
            continue
        (size,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", blob[pos + 5 : pos + 9])
            return w, h
        pos += 2 + size
    raise ValueError("no SOF marker found")


class SampleFrames:
    """Actor-pool video frame-sampling stage — FLAT output: one row per
    sampled frame (doc id, frame index, frame digest, frame bytes length).

    * ``codec="mjpeg-avi"`` — REAL container parse via the pure-stdlib
      RIFF/AVI walker (``sources/avi.py``): the payload is an AVI whose
      video chunks are complete JPEGs; every ``stride``-th chunk is
      sampled and emitted with its digest, byte length and (when
      ``decode_dims=True``) the width/height from a cheap JPEG SOF header
      scan — no full pixel decode on the sampling path.
      ``on_error="skip"`` (default) drops undecodable payloads;
      ``on_error="raise"`` propagates.
    * ``fake=True`` — treats the payload as a raw stream of consecutive
      ``frame_bytes``-byte frames (for synthetic benches). The trailing
      partial frame is dropped (a real sampler drops partial GOPs too).
    * neither — raises ``NotImplementedError`` (general containers need
      ffmpeg, absent from this environment)."""

    def __init__(
        self,
        bin_col: str = "payload",
        id_col: str = "doc_id",
        fake: bool = False,
        frame_bytes: int = 256,
        stride: int = 2,
        codec: str | None = None,
        on_error: str = "skip",
        decode_dims: bool = False,
    ):
        if codec not in (None, "mjpeg-avi"):
            raise NotImplementedError(
                f"codec {codec!r}: 'mjpeg-avi' parses natively (pure-stdlib "
                "RIFF/AVI walker); other containers need ffmpeg, absent here"
            )
        if codec is None and not fake:
            raise NotImplementedError(
                "pass codec='mjpeg-avi' for real container parsing or "
                "fake=True for the raw-stream stand-in"
            )
        self.bin_col = bin_col
        self.id_col = id_col
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.codec = codec
        self.on_error = on_error
        self.decode_dims = decode_dims

    def _avi_call(self, batch: pa.Table) -> pa.Table:
        from .avi import avi_decode_frames

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_sha, out_len, out_w, out_h = [], [], [], [], [], []
        for i, blob in zip(ids, batch[self.bin_col].to_pylist()):
            try:
                frames = avi_decode_frames(blob or b"")
            except (ValueError, struct.error):
                if self.on_error == "raise":
                    raise
                continue
            for fi in range(0, len(frames), self.stride):
                frame = frames[fi]
                out_id.append(int(i))
                out_idx.append(fi)
                out_sha.append(hashlib.sha256(frame).hexdigest()[:16])
                out_len.append(len(frame))
                if self.decode_dims:
                    try:
                        w, h = _jpeg_dims(frame)
                    except (ValueError, struct.error):
                        if self.on_error == "raise":
                            raise
                        w = h = None
                    out_w.append(w)
                    out_h.append(h)
        cols = {
            self.id_col: pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_idx, type=pa.int64()),
            "frame_sha": pa.array(out_sha, type=pa.string()),
            "frame_bytes": pa.array(out_len, type=pa.int64()),
        }
        if self.decode_dims:
            cols["frame_w"] = pa.array(out_w, type=pa.int32())
            cols["frame_h"] = pa.array(out_h, type=pa.int32())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "mjpeg-avi":
            return self._avi_call(batch)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_sha, out_len = [], [], [], []
        fb, st = self.frame_bytes, self.stride
        for i, blob in zip(ids, batch[self.bin_col].to_pylist()):
            blob = blob or b""
            n_frames = len(blob) // fb
            for fi in range(0, n_frames, st):
                frame = blob[fi * fb : (fi + 1) * fb]
                out_id.append(int(i))
                out_idx.append(fi)
                out_sha.append(hashlib.sha256(frame).hexdigest()[:16])
                out_len.append(len(frame))
        return pa.table(
            {
                self.id_col: pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_sha": pa.array(out_sha, type=pa.string()),
                "frame_bytes": pa.array(out_len, type=pa.int64()),
            }
        )


class ResizeImage:
    """Actor-pool image resize / thumbnailing stage.

    * ``codec="png" | "jpeg" | "auto"`` — REAL thumbnailing: decode the
      binary payload via the pure-numpy codecs, bilinear-resample
      (``raster/resize.py``, half-pixel-center convention) into a
      ``max_side`` bounding box (aspect preserved, never upscaled), and
      re-encode as PNG into a ``resized_payload`` column with
      ``resized_width`` / ``resized_height``. ``on_error="null"``
      (default) emits null output columns for undecodable payloads.
    * no codec — metadata-only: clamps existing (img_width, img_height)
      columns (from :class:`DecodeImage`) into the box, emitting only the
      resized dims — the bookkeeping mode for formats with no native codec.
    """

    def __init__(
        self,
        max_side: int = 32,
        codec: str | None = None,
        bin_col: str = "payload",
        on_error: str = "null",
    ):
        if codec not in (None, "png", "jpeg", "auto"):
            raise NotImplementedError(
                f"codec {codec!r}: 'png', 'jpeg' and 'auto' decode natively; "
                "other formats need external libs absent from this container"
            )
        self.max_side = max_side
        self.codec = codec
        self.bin_col = bin_col
        self.on_error = on_error

    def _decode(self, blob: bytes) -> np.ndarray:
        if self.codec == "jpeg" or (self.codec == "auto" and blob[:2] == b"\xff\xd8"):
            from ..raster.jpeg import jpeg_decode

            return jpeg_decode(blob)
        from ..raster.png import png_decode

        if self.codec == "auto" and blob[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("unknown image magic")
        return png_decode(blob)

    def _pixel_call(self, batch: pa.Table) -> pa.Table:
        from ..raster.resize import fit_box, resize_bilinear
        from ..raster.viz import png_encode_rgb

        ws, hs, blobs = [], [], []
        for blob in batch[self.bin_col].to_pylist():
            try:
                img = self._decode(blob or b"")
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                h, w = img.shape[:2]
                rw, rh = fit_box(w, h, self.max_side)
                thumb = resize_bilinear(img, rh, rw)
                out_blob = png_encode_rgb(np.ascontiguousarray(thumb[:, :, :3]))
            except (ValueError, KeyError, IndexError, OSError, zlib.error, struct.error):
                if self.on_error == "raise":
                    raise
                rw = rh = None
                out_blob = None
            ws.append(rw)
            hs.append(rh)
            blobs.append(out_blob)
        return (
            batch.append_column("resized_width", pa.array(ws, type=pa.int32()))
            .append_column("resized_height", pa.array(hs, type=pa.int32()))
            .append_column("resized_payload", pa.array(blobs, type=pa.binary()))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec is not None:
            return self._pixel_call(batch)
        w = batch["img_width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["img_height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1.0))
        rw = np.maximum((w * scale).astype(np.int32), 1)
        rh = np.maximum((h * scale).astype(np.int32), 1)
        return batch.append_column("resized_width", pa.array(rw)).append_column(
            "resized_height", pa.array(rh)
        )


class AudioFeatures:
    """Actor-pool audio feature-extraction stage: per-window features, one
    output row per full window (trailing partial windows dropped).

    Two real modes plus the stand-in:

    * ``codec="wav"`` — REAL decode via the pure-numpy RIFF/WAVE codec
      (``sources/wav.py``; PCM 8/16/24/32 + IEEE float, any channel count).
      Multi-channel input is downmixed by the per-frame channel mean, then
      per ``window``-sample window emits ``mean_amp`` (mean raw amplitude),
      ``rms`` (sqrt of mean squared amplitude) and ``zcr`` (count of strict
      sign changes inside the window) plus the container ``sr``.
      ``on_error="skip"`` (default) drops undecodable payloads — the
      FormatMapper skip-invalid idiom; ``on_error="raise"`` propagates.
    * ``fake=True`` — treats the payload as raw unsigned 8-bit PCM and
      emits one row per window with its mean byte level (``mean_level``).
    * neither — raises ``NotImplementedError`` (real compressed-audio
      containers need codec libs absent from this environment)."""

    def __init__(
        self,
        bin_col: str = "payload",
        id_col: str = "doc_id",
        fake: bool = False,
        window: int = 512,
        codec: str | None = None,
        on_error: str = "skip",
    ):
        if codec not in (None, "wav"):
            raise NotImplementedError(
                f"codec {codec!r}: 'wav' decodes natively (pure-numpy RIFF/WAVE "
                "codec); compressed formats need libs absent from this container"
            )
        if codec is None and not fake:
            raise NotImplementedError(
                "pass codec='wav' for real decode or fake=True for the "
                "raw-PCM stand-in"
            )
        self.bin_col = bin_col
        self.id_col = id_col
        self.window = window
        self.codec = codec
        self.on_error = on_error

    def _wav_call(self, batch: pa.Table) -> pa.Table:
        from .wav import wav_decode

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        w = self.window
        out_id, out_w, out_mean, out_rms, out_zcr, out_sr = [], [], [], [], [], []
        for i, blob in zip(ids, batch[self.bin_col].to_pylist()):
            try:
                samples, sr = wav_decode(blob or b"")
            except (ValueError, struct.error):
                if self.on_error == "raise":
                    raise
                continue
            n_win = samples.shape[0] // w
            if not n_win:
                continue
            # channel-mean downmix; int64 up-cast keeps integer sums exact.
            # PCM8 is offset-binary (silence = 128): center it so
            # mean/rms/zero-crossings are meaningful amplitudes
            if samples.dtype == np.uint8:
                samples = samples.astype(np.int64) - 128
            if np.issubdtype(samples.dtype, np.integer):
                mono = samples.astype(np.int64).sum(axis=1) / samples.shape[1]
            else:
                mono = samples.astype(np.float64).mean(axis=1)
            win = mono[: n_win * w].reshape(n_win, w)
            out_id.append(np.full(n_win, int(i), dtype=np.int64))
            out_w.append(np.arange(n_win, dtype=np.int64))
            out_mean.append(win.sum(axis=1) / w)
            out_rms.append(np.sqrt((win * win).sum(axis=1) / w))
            out_zcr.append((win[:, :-1] * win[:, 1:] < 0).sum(axis=1).astype(np.int64))
            out_sr.append(np.full(n_win, sr, dtype=np.int64))
        if not out_id:
            empty = {
                self.id_col: pa.array([], type=pa.int64()),
                "win_idx": pa.array([], type=pa.int64()),
                "mean_amp": pa.array([], type=pa.float64()),
                "rms": pa.array([], type=pa.float64()),
                "zcr": pa.array([], type=pa.int64()),
                "sr": pa.array([], type=pa.int64()),
            }
            return pa.table(empty)
        return pa.table(
            {
                self.id_col: pa.array(np.concatenate(out_id)),
                "win_idx": pa.array(np.concatenate(out_w)),
                "mean_amp": pa.array(np.concatenate(out_mean), type=pa.float64()),
                "rms": pa.array(np.concatenate(out_rms), type=pa.float64()),
                "zcr": pa.array(np.concatenate(out_zcr)),
                "sr": pa.array(np.concatenate(out_sr)),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "wav":
            return self._wav_call(batch)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        w = self.window
        out_id, out_w, out_mean = [], [], []
        for i, blob in zip(ids, batch[self.bin_col].to_pylist()):
            blob = blob or b""
            n_win = len(blob) // w
            if n_win:
                arr = np.frombuffer(blob[: n_win * w], dtype=np.uint8).reshape(n_win, w)
                means = arr.mean(axis=1)
                out_id.append(np.full(n_win, int(i), dtype=np.int64))
                out_w.append(np.arange(n_win, dtype=np.int64))
                out_mean.append(means)
        if not out_id:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "win_idx": pa.array([], type=pa.int64()),
                    "mean_level": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                self.id_col: pa.array(np.concatenate(out_id)),
                "win_idx": pa.array(np.concatenate(out_w)),
                "mean_level": pa.array(np.concatenate(out_mean), type=pa.float64()),
            }
        )


class DecodeImage:
    """Actor-pool image decode stage.

    Three modes:

    * ``codec="png"`` / ``codec="jpeg"`` — REAL decode via the repo's
      pure-numpy codecs (``raster/png.py``, ``raster/jpeg.py`` — stdlib
      zlib only, no PIL/libjpeg): emits the true width / height / channel
      count plus ``feat_dim`` features (per-channel means then a luma
      histogram). ``codec="auto"`` sniffs the payload magic (PNG / JFIF
      SOI). ``on_error="null"`` (default) emits null feature columns for
      undecodable payloads — the FormatMapper skip-invalid idiom;
      ``on_error="raise"`` propagates.
    * ``fake=True`` — deterministic stand-in deriving shape/features
      from the payload digest (for synthetic benches / formats with no
      codec in this container).
    * neither — raises ``NotImplementedError``.

    Use small ``batch_size`` (e.g. 64) in ``map_batches`` — payloads are
    large and batches must fit the worker heap.
    """

    def __init__(
        self,
        bin_col: str = "payload",
        fake: bool = False,
        feat_dim: int = 8,
        codec: str | None = None,
        on_error: str = "null",
    ):
        if codec not in (None, "png", "jpeg", "auto"):
            raise NotImplementedError(
                f"codec {codec!r}: 'png', 'jpeg' and 'auto' decode natively (pure-numpy codecs); "
                "other formats need external libs absent from this container"
            )
        if codec is None and not fake:
            raise NotImplementedError(
                "pass codec='png'/'jpeg'/'auto' for real decode (pure-numpy codecs) "
                "or fake=True for the deterministic stand-in"
            )
        self.bin_col = bin_col
        self.feat_dim = feat_dim
        self.codec = codec
        self.on_error = on_error

    def _fake_decode(self, blob: bytes):
        h = hashlib.sha256(blob).digest()
        w = 16 + h[0] % 64
        hgt = 16 + h[1] % 64
        feats = np.frombuffer(h[2 : 2 + self.feat_dim], dtype=np.uint8).astype(np.float64) / 255.0
        return w, hgt, 3, feats

    def _codec_decode(self, blob: bytes):
        if self.codec == "jpeg":
            from ..raster.jpeg import jpeg_decode as _dec
        elif self.codec == "auto":
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                from ..raster.png import png_decode as _dec
            elif blob[:2] == b"\xff\xd8":
                from ..raster.jpeg import jpeg_decode as _dec
            else:
                raise ValueError("unknown image magic")
        else:
            from ..raster.png import png_decode as _dec

        img = _dec(blob)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        px = img.astype(np.float64) / 255.0
        means = px.mean(axis=(0, 1))  # (c,)
        luma = px.mean(axis=2).ravel()
        n_bins = max(self.feat_dim - len(means), 0)
        if n_bins:
            hist, _ = np.histogram(luma, bins=n_bins, range=(0.0, 1.0))
            hist = hist / max(luma.size, 1)
            feats = np.concatenate([means, hist])[: self.feat_dim]
        else:
            feats = means[: self.feat_dim]
        return w, h, c, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, feats = [], [], [], []
        decode = self._codec_decode if self.codec is not None else self._fake_decode
        for blob in batch[self.bin_col].to_pylist():
            try:
                w, h, c, f = decode(blob or b"")
            except (ValueError, KeyError, IndexError, OSError, zlib.error, struct.error):
                if self.on_error == "raise" or self.codec is None:
                    raise
                w = h = c = None
                f = None
            ws.append(w)
            hs.append(h)
            cs.append(c)
            feats.append(None if f is None else list(f))
        return (
            batch.append_column("img_width", pa.array(ws, type=pa.int32()))
            .append_column("img_height", pa.array(hs, type=pa.int32()))
            .append_column("img_channels", pa.array(cs, type=pa.int32()))
            .append_column("img_features", pa.array(feats, type=pa.list_(pa.float64())))
        )
