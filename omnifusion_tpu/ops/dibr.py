"""Depth-image-based rendering helpers (vertical / horizontal baselines).

Parity: util.py:384-413 — disparity fields from spherical derivatives,
coordinate grids offset by the disparity, then forward-splat rendering.
Coordinates and grids are channel-last.
"""

from __future__ import annotations

import jax.numpy as jnp

from omnifusion_tpu.ops import derivatives as D
from omnifusion_tpu.ops.splatting import render


def _clean(x):
    return jnp.where(jnp.isnan(x) | jnp.isinf(x), 0.0, x)


def dibr_vertical(depth, image, uvgrid, sgrid, baseline, max_depth: float = 8.0):
    """Render the view shifted vertically by ``baseline`` (util.py:384-397).

    depth: (B,H,W,1); image: (B,H,W,C); uvgrid/sgrid: (B,H,W,2).
    """
    disp = jnp.concatenate(
        [jnp.zeros_like(depth), D.dtheta_vertical(sgrid, depth, baseline)], axis=-1
    )
    coords = _clean(uvgrid + disp)
    rendered, _ = render(image, depth, coords, max_depth=max_depth)
    return rendered


def dibr_horizontal(depth, image, uvgrid, sgrid, baseline, max_depth: float = 8.0):
    """Render the view shifted horizontally (util.py:399-413); the u
    coordinate wraps modulo the panorama width."""
    w = image.shape[2]
    disp = jnp.concatenate(
        [
            D.dphi_horizontal_clip(sgrid, depth, baseline),
            D.dtheta_horizontal_clip(sgrid, depth, baseline),
        ],
        axis=-1,
    )
    coords = uvgrid + disp
    coords = coords.at[..., 0].set(jnp.mod(coords[..., 0] + w, w))
    coords = _clean(coords)
    rendered, _ = render(image, depth, coords, max_depth=max_depth)
    return rendered
