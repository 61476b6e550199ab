"""Arbitrary perspective-view extraction from panoramas.

Capability parity with the reference's rotation-matrix projection variant
(equi_pers/equi2pers_torch.py:37-113 and its inverse), which extracts true
pinhole views at arbitrary (theta, phi) centers with tan-scaled image planes
(w_len = tan(fov/2), equi2pers_torch.py:51-52).  Built on the same static
quad-table machinery as the main projections: tables are cached per
(centers, fov, size, erp) and sampling is one fused gather-blend.

Note the screen-coordinate difference from the main model path: the tangent
patches of equi2pers_v3 use ANGLE-linear screen coords (x = +-pi*fov/360),
a slightly non-pinhole spacing; true perspective uses tan spacing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from omnifusion_tpu.geometry import gnomonic
from omnifusion_tpu.ops.sparse_blend import quad_gather_blend


@functools.lru_cache(maxsize=64)
def _perspective_tables(
    centers_deg: tuple, fov_deg: tuple, size: tuple, erp_size: tuple
):
    h, w = size
    erp_h, erp_w = erp_size
    fov_h, fov_w = fov_deg

    # true pinhole image plane: tan-scaled tangent coords
    x = np.linspace(-1.0, 1.0, w) * np.tan(np.radians(fov_w) / 2.0)
    y = np.linspace(-1.0, 1.0, h) * np.tan(np.radians(fov_h) / 2.0)
    X = np.broadcast_to(x[None, None, :], (len(centers_deg), h, w))
    Y = np.broadcast_to(y[None, :, None], (len(centers_deg), h, w))

    centers = np.asarray(centers_deg, np.float64)
    # theta=0 deg is the ERP left edge (lon=-pi), matching the patch-center
    # convention of the main projections (layout.py)
    theta_c = (np.radians(centers[:, 0]) - np.pi)[:, None, None]
    phi_c = np.radians(centers[:, 1])[:, None, None]
    lon, lat = gnomonic.forward(X, Y, theta_c, phi_c)

    lon_n = np.mod(lon / np.pi + 1.0, 2.0) - 1.0  # wrap to [-1, 1)
    lat_n = lat / (np.pi / 2.0)

    ix = np.clip((lon_n + 1.0) * 0.5 * (erp_w - 1), 0.0, erp_w - 1)
    iy = np.clip((lat_n + 1.0) * 0.5 * (erp_h - 1), 0.0, erp_h - 1)
    x0 = np.floor(ix).astype(np.int64)
    y0 = np.floor(iy).astype(np.int64)
    fx = ix - x0
    fy = iy - y0
    w4 = np.stack([(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], -1)

    from omnifusion_tpu.projection.spec import _fold_clamped_corners

    w4 = _fold_clamped_corners(w4, x0 + 1 > erp_w - 1, y0 + 1 > erp_h - 1)
    idx = (y0 * erp_w + x0).reshape(-1, 1).astype(np.int32)
    return idx, w4.reshape(-1, 1, 4).astype(np.float32)


def extract_views(erp, centers_deg, fov=(90.0, 90.0), size=(256, 256)):
    """Extract pinhole views at arbitrary sphere directions.

    erp: (B, H, W, C); centers_deg: sequence of (theta, phi) in degrees with
    theta in [0, 360) and phi in (-90, 90); fov/size: per-view.

    Returns (B, V, h, w, C).
    """
    b, h, w, c = erp.shape
    centers = tuple(tuple(float(v) for v in ct) for ct in centers_deg)
    fov_t = (float(fov[0]), float(fov[1])) if isinstance(fov, (tuple, list)) else (float(fov), float(fov))
    size_t = (int(size[0]), int(size[1]))
    idx, w4 = _perspective_tables(centers, fov_t, size_t, (h, w))
    out = quad_gather_blend(erp.reshape(b, h * w, c), jnp.asarray(idx), jnp.asarray(w4), w)
    return out.reshape(b, len(centers), size_t[0], size_t[1], c)
