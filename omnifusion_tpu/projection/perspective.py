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

    Port of util.transform_equi (util.py:40-50): the reference repeats the
    panorama per view and calls the rotation-matrix equi2pers
    (equi_pers/equi2pers_torch.py:37); here the view axis is first-class.

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


@functools.lru_cache(maxsize=64)
def _inverse_perspective_tables(
    centers_deg: tuple, fov_deg: tuple, size: tuple, erp_size: tuple
):
    """Per-view ERP sampling tables for insert_views: quad index into the
    view image, bilinear weights, and the visibility mask."""
    h, w = size
    erp_h, erp_w = erp_size
    fov_h, fov_w = fov_deg
    V = len(centers_deg)

    # the reference samples the ERP grid with pixel CENTERS spanning the full
    # angle range via linspace (pers2equi_torch.py:42), matching our
    # align_corners grids elsewhere
    lat = np.linspace(-np.pi / 2.0, np.pi / 2.0, erp_h)[None, :, None]
    lon = np.linspace(-np.pi, np.pi, erp_w)[None, None, :]
    centers = np.asarray(centers_deg, np.float64)
    theta_c = (np.radians(centers[:, 0]) - np.pi)[:, None, None]
    phi_c = np.radians(centers[:, 1])[:, None, None]

    x, y, cos_c = gnomonic.inverse(
        np.broadcast_to(lon, (V, erp_h, erp_w)),
        np.broadcast_to(lat, (V, erp_h, erp_w)),
        theta_c,
        phi_c,
    )
    # tan image plane (true pinhole): visible iff in front of the camera and
    # inside the tan-scaled bounds (pers2equi_torch.py:64-71)
    w_len = np.tan(np.radians(fov_w) / 2.0)
    h_len = np.tan(np.radians(fov_h) / 2.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        mask = (cos_c > 0) & (np.abs(x) < w_len) & (np.abs(y) < h_len)
        ix = np.clip((x / w_len + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
        iy = np.clip((y / h_len + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
    ix = np.nan_to_num(ix)
    iy = np.nan_to_num(iy)
    x0 = np.floor(ix).astype(np.int64)
    y0 = np.floor(iy).astype(np.int64)
    fx = ix - x0
    fy = iy - y0
    w4 = np.stack([(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], -1)
    w4 = w4 * mask[..., None]

    from omnifusion_tpu.projection.spec import _fold_clamped_corners

    w4 = _fold_clamped_corners(w4, x0 + 1 > w - 1, y0 + 1 > h - 1)
    base = (np.arange(V, dtype=np.int64) * (h * w))[:, None, None]
    idx = (base + y0 * w + x0).reshape(-1, 1).astype(np.int32)
    return (
        idx,
        w4.reshape(-1, 1, 4).astype(np.float32),
        mask.astype(np.float32),
    )


def insert_views(views, centers_deg, fov=(90.0, 90.0), erp_size=(512, 1024)):
    """Project pinhole views back onto the panorama, one ERP per view.

    Port of util.transform_pers (util.py:53-60) / the rotation-matrix inverse
    (equi_pers/pers2equi_torch.py:37-84): bilinear resample of each view onto
    the sphere, zeros outside the view frustum, plus the visibility mask.

    views: (B, V, h, w, C) as returned by extract_views with the same
    centers/fov.  Returns (equi (B, V, H, W, C), mask (V, H, W, 1)).
    """
    b, v, h, w, c = views.shape
    centers = tuple(tuple(float(t) for t in ct) for ct in centers_deg)
    fov_t = (float(fov[0]), float(fov[1])) if isinstance(fov, (tuple, list)) else (float(fov), float(fov))
    erp_t = (int(erp_size[0]), int(erp_size[1]))
    idx, w4, mask = _inverse_perspective_tables(centers, fov_t, (h, w), erp_t)
    out = quad_gather_blend(
        views.reshape(b, v * h * w, c), jnp.asarray(idx), jnp.asarray(w4), w
    )
    out = out.reshape(b, v, erp_t[0], erp_t[1], c)
    return out, jnp.asarray(mask)[..., None]
