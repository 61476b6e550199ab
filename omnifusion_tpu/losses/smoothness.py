"""Edge-guided smoothness loss (parity: supervision/smoothness.py:3-7)."""

from __future__ import annotations

import jax.numpy as jnp


def guided_smoothness_loss(input_duv, guide_duv, mask, weights=None):
    """Penalize prediction gradients where the guide image is smooth.

    input_duv/guide_duv: image-gradient magnitudes (e.g. from
    omnifusion_tpu.ops.gradients.imgrad_yx); mask: boolean validity.
    """
    smooth = input_duv * jnp.exp(-guide_duv)
    smooth = jnp.where(mask, smooth, 0.0)
    if weights is not None:
        smooth = smooth * weights
    denom = jnp.maximum(jnp.sum(mask.astype(smooth.dtype)), 1.0)
    return jnp.sum(smooth) / denom
