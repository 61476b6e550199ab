"""Panorama stretch augmentation (kx/ky anisotropic world stretch), NHWC.

Parity: equi_pers/pano_stretch.py:11-59 — per-pixel resampling coordinates
from the stretched sphere, bilinear sampling with zero padding and
align_corners=True.  The coordinate grid is static per (H, W, kx, ky), so it
is precomputed and the sampling reuses the quad gather-blend.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from omnifusion_tpu.ops.sparse_blend import quad_gather_blend


@functools.lru_cache(maxsize=32)
def _stretch_tables(h: int, w: int, kx: float, ky: float):
    uv = np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1).astype(np.float64)
    u = ((uv[..., 0] + 0.5) / w - 0.5) * 2 * np.pi
    v = ((uv[..., 1] + 0.5) / h - 0.5) * np.pi
    sin_u, cos_u, tan_v = np.sin(u), np.cos(u), np.tan(v)
    u0 = np.arctan2(sin_u * kx / ky, cos_u)
    with np.errstate(divide="ignore", invalid="ignore"):
        v0 = np.arctan(tan_v * np.sin(u0) / sin_u * ky)
    v0 = np.nan_to_num(v0, nan=0.0)

    gx = u0 / np.pi  # normalized grid in [-1, 1]
    gy = v0 / (np.pi / 2.0)

    # grid_sample semantics: align_corners=True, padding_mode='zeros'
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)
    x0 = np.floor(ix).astype(np.int64)
    y0 = np.floor(iy).astype(np.int64)
    fx = ix - x0
    fy = iy - y0
    w_corner = [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx]
    corners = [(y0, x0), (y0, x0 + 1), (y0 + 1, x0), (y0 + 1, x0 + 1)]

    # anchor the quad at a clamped in-bounds position and remap each
    # in-bounds corner to its slot relative to the new anchor; outside
    # corners contribute nothing (padding_mode='zeros')
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    w4 = np.zeros((h, w, 4))
    for wc, (yy, xx) in zip(w_corner, corners):
        dy = yy - y0c
        dx = xx - x0c
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        valid = inside & (dy >= 0) & (dy <= 1) & (dx >= 0) & (dx <= 1)
        slot = dy * 2 + dx  # in {0..3} where valid
        for s in range(4):
            w4[..., s] += np.where(valid & (slot == s), wc, 0.0)
    idx = (y0c * w + x0c).reshape(-1, 1)
    return (
        np.asarray(idx, np.int32),
        np.asarray(w4.reshape(-1, 1, 4), np.float32),
    )


def pano_stretch(img, kx: float, ky: float):
    """Stretch a panorama by kx (x/z plane) and ky: (B, H, W, C) -> same."""
    b, h, w, c = img.shape
    idx, w4 = _stretch_tables(h, w, float(kx), float(ky))
    out = quad_gather_blend(img.reshape(b, h * w, c), jnp.asarray(idx), jnp.asarray(w4), w)
    return out.reshape(b, h, w, c)
