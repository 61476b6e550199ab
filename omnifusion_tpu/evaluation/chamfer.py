"""Chamfer distance between point sets (parity: util.py:201-257).

The reference materializes the full (N, M) pairwise tensor via repeat; here
it is a scanned row-block computation so large clouds fit in memory, with the
same result: sum over batch of sum_i min_j ||p1_i - p2_j||.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chamfer_distance(p1, p2, block: int = 1024):
    """One-directional chamfer distance (matches the reference's direction).

    p1: (B, N, D); p2: (B, M, D) -> scalar sum over batch and points of the
    distance from each p1 point to its nearest p2 point.
    """
    b, n, d = p1.shape
    pad = (-n) % block
    p1p = jnp.pad(p1, ((0, 0), (0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((b, n), p1.dtype), ((0, 0), (0, pad)))
    blocks = p1p.reshape(b, -1, block, d).swapaxes(0, 1)
    vblocks = valid.reshape(b, -1, block).swapaxes(0, 1)

    def body(carry, xs):
        pb, vb = xs
        d2 = jnp.sum(
            jnp.square(pb[:, :, None, :] - p2[:, None, :, :]), axis=-1
        )
        dmin = jnp.sqrt(jnp.min(d2, axis=-1))
        return carry + jnp.sum(dmin * vb), None

    total, _ = jax.lax.scan(body, jnp.zeros((), p1.dtype), (blocks, vblocks))
    return total


def chamfer_distance_symmetric(p1, p2, block: int = 1024):
    """Symmetric variant: chamfer(p1 -> p2) + chamfer(p2 -> p1)."""
    return chamfer_distance(p1, p2, block) + chamfer_distance(p2, p1, block)
