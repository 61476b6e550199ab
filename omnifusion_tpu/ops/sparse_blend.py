"""Fused static-sparse gather-blend: out = W_sparse @ src.

Both gnomonic projections (ERP -> patches and patches -> ERP) reduce to a
static sparse matrix-vector product per channel: every output pixel is a
fixed weighted sum of K input pixels.  This module is the single runtime
primitive serving both directions (replacing the reference's F.grid_sample
call in equi2pers_v3.py:111 and the 4-corner advanced-index gather + masked
normalize in pers2equi_v3.py:171-196).

The XLA path (jnp.take + einsum) compiles to a fused gather on TPU; a Pallas
kernel can be slotted in behind the same interface.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_blend(src_flat: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted gather along the pixel axis.

    Args:
      src_flat: (B, N_in, C) source pixels.
      idx: (N_out, K) int32 indices into N_in (entries with zero weight may
        point anywhere valid).
      w: (N_out, K) blend weights.

    Returns:
      (B, N_out, C) = sum_k w[n, k] * src_flat[:, idx[n, k], :].
    """
    n_out, k = idx.shape
    g = jnp.take(src_flat, idx.reshape(-1), axis=1)
    g = g.reshape(src_flat.shape[0], n_out, k, src_flat.shape[-1])
    return jnp.einsum("bnkc,nk->bnc", g, w.astype(src_flat.dtype))
