"""Depth -> surface normals on the sphere, NHWC.

Two estimators with reference parity:
  - ``normals_cross``: 4-neighbor cross-product averaging
    (util.py:332-382, depth2normal_gpu) + curvature map (util.py:376-381).
  - ``normals_plane_fit``: least-squares plane fit over a dilated 5x5
    neighborhood with a closed-form 3x3 inverse
    (equi_pers/depth2normal.py:9-62; torch.linalg.inv replaced by the
    explicit adjugate so everything stays fused on device).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from omnifusion_tpu.geometry.sphere import coords2uv_np, uv2xyz_np


def _sphere_xyz(h: int, w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(range(w), range(h)), -1).reshape(-1, 2) + 1
    return uv2xyz_np(coords2uv_np(coords, w, h)).reshape(h, w, 3).astype(np.float32)


def _normalize(v, axis=-1, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def depth_to_points(depth):
    """(B, H, W, 1) depth -> (B, H, W, 3) points on the sphere rays."""
    b, h, w, _ = depth.shape
    xyz = jnp.asarray(_sphere_xyz(h, w))
    return xyz[None] * depth


def normals_cross(depth, return_curvature: bool = False):
    """Cross-product normals (parity: util.py:332-382).

    depth: (B, H, W, 1) -> normals (B, H, W, 3) unit vectors.
    """
    v = depth_to_points(depth)
    # neighbor differences, zero-padded at the borders (util.py:350-353)
    vec0 = jnp.pad(v[:, :, :-1] - v[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    vec2 = jnp.pad(v[:, :-1] - v[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    vec4 = jnp.pad(v[:, :, 1:] - v[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    vec6 = jnp.pad(v[:, 1:] - v[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))

    n = _normalize(jnp.cross(vec2, vec0))
    n = n + _normalize(jnp.cross(vec4, vec2))
    n = n + _normalize(jnp.cross(vec6, vec4))
    n = n + _normalize(jnp.cross(vec0, vec6))
    n = _normalize(n)
    if not return_curvature:
        return n
    # curvature from normal disagreement (util.py:370-381)
    pad = jnp.pad(n, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h = depth.shape[1]
    w = depth.shape[2]
    n1 = pad[:, :h, 1:-1]
    n2 = pad[:, 2:, 1:-1]
    n3 = pad[:, 1:-1, :w]
    n4 = pad[:, 1:-1, 2:]
    cur = (1 - jnp.sum(n1 * n2, -1) / 2) + (1 - jnp.sum(n3 * n4, -1) / 2)
    cur = cur / 2
    cur = jnp.where(cur < 1e-6, 0.0, cur)
    return n, cur


def _inv3x3(m):
    """Closed-form 3x3 inverse via the adjugate (batched over leading dims)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    adj = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        -2,
    )
    return adj / det[..., None, None], det


def normals_plane_fit(depth, kernel_size: int = 5, dilation: int = 2):
    """Least-squares plane-fit normals (parity: equi_pers/depth2normal.py).

    Solves A n = 1 over each (dilated) kxk neighborhood of 3D points; the
    Gram matrix with det < 1e-5 falls back to identity like the reference.
    depth: (B, H, W, 1) -> (B, H, W, 3).
    """
    b, h, w, _ = depth.shape
    pts = depth_to_points(depth)  # (B, H, W, 3)
    k = kernel_size
    pad = k - 1  # reference uses padding=k-1 with dilation=2
    patches = jax.lax.conv_general_dilated_patches(
        pts,
        filter_shape=(k, k),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W, 3*k*k) with channel-major feature order
    a = patches.reshape(b, h, w, 3, k * k).swapaxes(-1, -2)  # (B,H,W,kk,3)
    gram = jnp.einsum("...ki,...kj->...ij", a, a)
    _, det = _inv3x3(gram)
    safe = jnp.where(
        (det >= 1e-5)[..., None, None], gram, jnp.eye(3, dtype=gram.dtype)
    )
    inv, _ = _inv3x3(safe)
    atb = jnp.sum(a, axis=-2)  # A^T @ ones
    n = jnp.einsum("...ij,...j->...i", inv, atb)
    return _normalize(n)
