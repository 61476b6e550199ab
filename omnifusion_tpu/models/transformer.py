"""Global patch-fusion transformer (pre-norm ViT blocks).

Parity target: model/blocks.py:14-88 and Transformer_cascade
(model/spherical_model.py:169-187) — separate q and kv projections without
bias, biased output projection, exact (erf) GELU, learned positional
embedding over the n_patch tokens, final LayerNorm(eps=1e-6).

The sequence is tiny (n_patch <= 46 tokens of width 512): attention runs as
plain einsums on the MXU; no flash/ring machinery is warranted
(SURVEY.md §2.6).  All dropout/droppath rates are 0 in the reference's usage
and are omitted.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def _dense(features, use_bias, name):
    return nn.Dense(
        features,
        use_bias=use_bias,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.xavier_uniform(),
        name=name,
    )


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        q = _dense(c, self.qkv_bias, "q")(x).reshape(b, n, h, d)
        kv = _dense(2 * c, self.qkv_bias, "kv")(x).reshape(b, n, 2, h, d)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        return _dense(c, True, "proj")(out)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden, True, "fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact
        return _dense(self.out, True, "fc2")(x)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        x = x + Attention(self.dim, self.num_heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x


class TransformerCascade(nn.Module):
    dim: int
    num_patches: int
    depth: int = 6
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        pos_emb = self.param(
            "pos_emb",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, self.num_patches, self.dim),
            jnp.float32,
        )
        x = x + pos_emb.astype(x.dtype)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.num_heads, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(x)
