"""Spherical disparity/depth derivatives for DIBR, channel-last.

Parity: spherical/derivatives.py:53-186.  sgrid is (..., 2) as
(phi=longitude, theta=latitude) from
omnifusion_tpu.geometry.sphere.create_spherical_grid; depth/disparity are
(B, H, W, 1); h below is the image height (max disparity h = w/2).
"""

from __future__ import annotations

import jax.numpy as jnp


def _phi(sgrid):
    return sgrid[..., 0:1]


def _theta(sgrid):
    return sgrid[..., 1:2]


def _clean(x):
    return jnp.where(jnp.isnan(x) | jnp.isinf(x), 0.0, x)


def dphi_horizontal_clip(sgrid, depth, baseline):
    h = depth.shape[1]
    dphi = jnp.sin(_phi(sgrid)) / (depth * jnp.cos(_theta(sgrid))) * baseline * (h / jnp.pi)
    return _clean(jnp.clip(dphi, -h, h))


def dtheta_horizontal_clip(sgrid, depth, baseline):
    h = depth.shape[1]
    d = jnp.cos(_phi(sgrid)) * jnp.sin(_theta(sgrid)) * baseline / depth * (h / jnp.pi)
    return jnp.clip(d, 0, h)


def dtheta_vertical(sgrid, depth, baseline):
    h = depth.shape[1]
    d = jnp.cos(_theta(sgrid)) * baseline / depth * (h / jnp.pi)
    return _clean(d)


def disparity_to_depth_theta(sgrid, disparity, baseline):
    h = disparity.shape[1]
    d = jnp.cos(_phi(sgrid)) * jnp.sin(_theta(sgrid)) * baseline / disparity * (h / jnp.pi)
    return _clean(d)


def disparity_to_depth_vertical(sgrid, disparity, baseline):
    h = disparity.shape[1]
    return jnp.cos(_theta(sgrid)) * baseline / disparity * (h / jnp.pi)


def dr_horizontal(sgrid, baseline):
    return -jnp.cos(_phi(sgrid)) * jnp.cos(_theta(sgrid)) * baseline
