"""Pallas TPU kernel: fused 2x bilinear upsample (half-pixel centers).

XLA lowers ``jax.image.resize`` to two separable dot_generals whose
operands re-tile between passes: the round-3 xplane profile of the b=64
flagship forward shows the decoder's five 2x upsamples moving 7.3 GB at
666 GB/s (~11 ms) — bandwidth-saturated on 5x the necessary bytes, plus
~10 ms of layout copies XLA schedules around the final stage.  A fused
stencil reads each input once and writes each output once (~1.5 GB for the
same stages).

For scale factor exactly 2 with align_corners=False, the resize is the
fixed 4-tap stencil (out coord o samples in coord (o+0.5)/2 - 0.5):

    out[2i]   = 0.25*in[i-1] + 0.75*in[i]      (edge-clamped)
    out[2i+1] = 0.75*in[i]   + 0.25*in[i+1]

applied separably in H and W inside one kernel pass.  Exact to f32
rounding vs jax.image.resize (pinned by tests/test_pallas_resize.py).

The backward rides a custom VJP whose cotangent path is the XLA
resize-transpose (autodiff of jax.image.resize) — the forward is linear
with identical weights, so gradients are exact while training keeps the
battle-tested XLA adjoint.

Used by models/layers.resize_bilinear(impl="pallas") for the decoder's
up_stages (matching torch F.interpolate(scale_factor=2, mode='bilinear',
align_corners=False), cf. the reference's spherical_model.py decoder).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _up2x_kernel(x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)  # (1, H, W, C) block
    # W direction
    xl = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    xr = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    even = 0.25 * xl + 0.75 * x
    odd = 0.75 * x + 0.25 * xr
    n, h, w, c = x.shape
    xw = jnp.stack([even, odd], axis=3).reshape(n, h, 2 * w, c)
    # H direction
    xu = jnp.concatenate([xw[:, :1], xw[:, :-1]], axis=1)
    xd = jnp.concatenate([xw[:, 1:], xw[:, -1:]], axis=1)
    even = 0.25 * xu + 0.75 * xw
    odd = 0.75 * xw + 0.25 * xd
    out = jnp.stack([even, odd], axis=2).reshape(n, 2 * h, 2 * w, c)
    o_ref[:] = out.astype(o_ref.dtype)


def _up2x_pallas(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else (CPU test meshes, the
        # driver's virtual-device dryrun) run the kernel interpreted
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    return pl.pallas_call(
        _up2x_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2x_bilinear(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C), torch/half-pixel bilinear semantics."""
    return _up2x_pallas(x, interpret)


def _fwd(x, interpret):
    return _up2x_pallas(x, interpret), x.shape


def _bwd(interpret, in_shape, cot):
    # linear op with identical weights: the XLA resize's transpose IS the
    # exact adjoint of the pallas forward
    def xla_resize(x):
        return jax.image.resize(
            x, cot.shape, method="bilinear"
        )

    (grad,) = jax.vjp(xla_resize, jnp.zeros(in_shape, cot.dtype))[1](cot)
    return (grad,)


upsample2x_bilinear.defvjp(_fwd, _bwd)
