"""Direct depth supervision losses.

Parity: supervision/direct.py in the torch reference.  The BerHu cutoff is
data-dependent (c = max|diff| / 5); the reference detaches it via ``.item()``
(a graph break) — here it is a traced ``stop_gradient`` so the whole loss
stays jittable with identical gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def berhu_loss(pred, gt, mask, weights=None):
    """Adaptive reverse-Huber loss, per-sample masked weighted mean
    (supervision/direct.py:3-20).

    pred/gt/mask/weights: (B, ...) broadcastable; mask selects valid pixels;
    weights defaults to 1.
    """
    bs = pred.shape[0]
    diff = gt - pred
    abs_diff = jnp.abs(diff)
    c = jax.lax.stop_gradient(jnp.max(abs_diff)) / 5.0
    l2 = (jnp.square(diff) + jnp.square(c)) / jnp.maximum(2.0 * c, 1e-12)
    loss = jnp.where(abs_diff <= c, abs_diff, l2)

    loss = loss.reshape(bs, -1)
    mask = jnp.broadcast_to(mask, pred.shape).reshape(bs, -1).astype(loss.dtype)
    if weights is None:
        weights = jnp.ones_like(loss)
    else:
        weights = jnp.broadcast_to(weights, pred.shape).reshape(bs, -1).astype(loss.dtype)
    count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    weighted = loss * mask * weights
    return jnp.mean(jnp.sum(weighted, axis=1) / count)


def l1_loss(pred, gt, mask):
    """Masked mean absolute error, per-sample normalized
    (supervision/direct.py:23-29)."""
    bs = pred.shape[0]
    loss = jnp.abs(gt - pred).reshape(bs, -1)
    mask = jnp.broadcast_to(mask, pred.shape).reshape(bs, -1).astype(loss.dtype)
    count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return jnp.mean(jnp.sum(loss * mask, axis=1) / count)
