"""Differentiable forward splatting (bilinear scatter-add), NHWC.

Parity: supervision/splatting.py in the torch reference (itself derived from
google/layered-scene-inference) — bilinear scatter_add_ splat with a 1e-3
weight threshold, depth-distance weighting 1/exp(2d/max_depth), and
weighted-average normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def splat(values, coords, shape_hw):
    """Bilinear forward-splat ``values`` at float ``coords``.

    values: (B, H, W, C); coords: (B, H, W, 2) as (u, v) target pixel
    coordinates; returns (B, out_h, out_w, C).
    """
    b, h, w, c = values.shape
    out_h, out_w = shape_hw
    u = coords[..., 0]
    v = coords[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    u1 = u0 + 1
    v1 = v0 + 1

    u0s = jnp.clip(u0, 0, out_w - 1)
    u1s = jnp.clip(u1, 0, out_w - 1)
    v0s = jnp.clip(v0, 0, out_h - 1)
    v1s = jnp.clip(v1, 0, out_h - 1)

    # corners that were clamped contribute nothing (splatting.py:26-29)
    u0w = (u1 - u) * (u0 == u0s)
    u1w = (u - u0) * (u1 == u1s)
    v0w = (v1 - v) * (v0 == v0s)
    v1w = (v - v0) * (v1 == v1s)

    out = jnp.zeros((b, out_h * out_w, c), values.dtype)
    flat_vals = values.reshape(b, h * w, c)
    for uw, us, vw, vs in (
        (u0w, u0s, v0w, v0s),
        (u1w, u1s, v0w, v0s),
        (u0w, u0s, v1w, v1s),
        (u1w, u1s, v1w, v1s),
    ):
        wgt = uw * vw
        wgt = wgt * (wgt >= 1e-3)  # weight threshold (splatting.py:33-38)
        tgt = (us + vs * out_w).astype(jnp.int32).reshape(b, h * w)
        contrib = flat_vals * wgt.reshape(b, h * w, 1)
        out = jax.vmap(
            lambda o, t, cv: o.at[t].add(cv, mode="drop")
        )(out, tgt, contrib)
    return out.reshape(b, out_h, out_w, c)


def depth_distance_weights(depth, max_depth: float = 20.0):
    """1 / exp(2 d / max_depth) (splatting.py:71-73)."""
    return 1.0 / jnp.exp(2.0 * depth / max_depth)


def weighted_average_splat(value, weights, epsilon: float = 1e-8):
    zero = (weights <= epsilon).astype(value.dtype)
    return value / (weights + epsilon * zero)


def render(img, depth, coords, max_depth: float = 20.0):
    """Depth-weighted forward-splat render (splatting.py:76-84).

    Returns (rendered, mask); mask marks pixels that received weight.
    """
    weights = depth_distance_weights(depth, max_depth)
    shape_hw = img.shape[1:3]
    splat_img = splat(img * weights, coords, shape_hw)
    splat_w = splat(weights, coords, shape_hw)
    recon = weighted_average_splat(splat_img, splat_w)
    mask = splat_w > 1e-3
    return recon, mask
