"""Pure-numpy image resampling kernels.

Vectorized bilinear resize with half-pixel centers (the PIL / OpenCV
``align_corners=False`` convention): output pixel (i, j) samples the source
at ``((j + 0.5) * w_in / w_out - 0.5, (i + 0.5) * h_in / h_out - 0.5)``,
edge-clamped. No Python loops — two gathers + two lerps.
"""

from __future__ import annotations

import numpy as np


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resample ``img`` (H, W) or (H, W, C) to (out_h, out_w[, C]).

    Integer dtypes round-half-up back to the input dtype; float dtypes stay
    float64.
    """
    if out_h < 1 or out_w < 1:
        raise ValueError(f"invalid output size {out_h}x{out_w}")
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, _c = img.shape
    src = img.astype(np.float64)

    def axis_coords(n_in: int, n_out: int):
        x = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        x = np.clip(x, 0.0, n_in - 1)
        lo = np.floor(x).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (x - lo)

    y0, y1, fy = axis_coords(h, out_h)
    x0, x1, fx = axis_coords(w, out_w)
    # rows first: (out_h, w, c)
    rows = src[y0] * (1.0 - fy)[:, None, None] + src[y1] * fy[:, None, None]
    # then columns: (out_h, out_w, c)
    out = rows[:, x0] * (1.0 - fx)[None, :, None] + rows[:, x1] * fx[None, :, None]
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max).astype(img.dtype)
    return out[:, :, 0] if squeeze else out


def fit_box(w: int, h: int, max_side: int) -> tuple[int, int]:
    """(w, h) scaled to fit a ``max_side`` square, aspect preserved, never
    upscaled, floor with a 1-pixel minimum — the thumbnailer bookkeeping
    the metadata-only ResizeImage mode mirrors."""
    scale = min(1.0, max_side / max(max(w, h), 1))
    return max(int(w * scale), 1), max(int(h * scale), 1)
