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

VMEM tiling (round-4 fix): the round-3 kernel blocked one whole image per
grid step and died in scoped-VMEM OOM at the flagship batch — 18.53 M vs
the 16 M limit at bf16 (1152, 64, 64, 32) -> (., 128, 128, 32)
(measurements.log 2026-08-18).  The grid now tiles H into row blocks; the
1-row halo above/below each block arrives as two extra single-row inputs
of the SAME array whose index maps clamp at the borders — the clamp IS the
stencil's edge condition, so the kernel needs no program_id branches.

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


def _up2x_kernel(xu_ref, xm_ref, xd_ref, o_ref):
    # (1, 1, W, C) halo row above | (1, HB, W, C) body | (1, 1, W, C) below
    x = jnp.concatenate(
        [
            xu_ref[:].astype(jnp.float32),
            xm_ref[:].astype(jnp.float32),
            xd_ref[:].astype(jnp.float32),
        ],
        axis=1,
    )  # (1, HB+2, W, C)
    # W direction (edge-clamped), on all HB+2 rows — 2 spare rows of VPU work.
    # W=1 degenerates to xl=xr=x (the clamp makes both taps the same pixel);
    # the general concat would emit a zero-size slice, which interpret mode
    # tolerates but mosaic rejects ("vector types must have positive constant
    # sizes", hit by the 1x1->2x2 stage of patch-32 configs on-chip).
    if x.shape[2] > 1:
        xl = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
        xr = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    else:
        xl = xr = x
    even = 0.25 * xl + 0.75 * x
    odd = 0.75 * x + 0.25 * xr
    n, hb2, w, c = x.shape
    xw = jnp.stack([even, odd], axis=3).reshape(n, hb2, 2 * w, c)
    # H direction: output rows belong to the HB interior rows; the halo rows
    # supply in[i-1] / in[i+1] (already border-clamped by the index maps)
    xc = xw[:, 1:-1]
    xup = xw[:, :-2]
    xdn = xw[:, 2:]
    even = 0.25 * xup + 0.75 * xc
    odd = 0.75 * xc + 0.25 * xdn
    out = jnp.stack([even, odd], axis=2).reshape(n, 2 * (hb2 - 2), 2 * w, c)
    o_ref[:] = out.astype(o_ref.dtype)


def _working_set_bytes(hb: int, w: int, c: int) -> float:
    """Kernel VMEM working set for an HB-row block: ~13 f32 copies of the
    (HB+2, W, C_pad) tile (x, xl/xr/even/odd, the 2W interleave x3, the
    2HBx2W output x3) plus double-buffered input/output blocks; C pads to
    the 128-lane tile.  The single budget both _row_block (tiler) and
    fits_vmem (router guard) check, so they cannot drift."""
    c_pad = -(-c // 128) * 128
    return 13 * (hb + 2) * w * c_pad * 4


_VMEM_BUDGET = 10e6  # of the ~16 MB scoped-VMEM limit


def _row_block(h: int, w: int, c: int) -> int:
    """Largest row block that both fits the VMEM budget AND divides H.

    The halving loop keeps `h % hb == 0` as an invariant (a non-dividing
    block would truncate grid=(n, h // hb) and silently skip the last
    h % hb input rows); hb=1 always divides, so the loop terminates with
    every row covered for any H."""
    hb = h
    while hb > 1 and (h % hb or _working_set_bytes(hb, w, c) > _VMEM_BUDGET):
        hb //= 2
    return hb


def fits_vmem(h: int, w: int, c: int) -> bool:
    """True when some row block (>= 1 row) fits the kernel's VMEM budget."""
    return _working_set_bytes(1, w, c) <= _VMEM_BUDGET


def _up2x_pallas(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else (CPU test meshes, the
        # driver's virtual-device dryrun) run the kernel interpreted
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    hb = _row_block(h, w, c)
    return pl.pallas_call(
        _up2x_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n, h // hb),
        in_specs=[
            # halo row above: clamps to row 0 at the top border, which IS the
            # stencil's edge-clamp (out[0] = 0.25*in[0] + 0.75*in[0-clamp])
            pl.BlockSpec(
                (1, 1, w, c),
                lambda i, j: (i, jnp.maximum(j * hb - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            # halo row below, clamped to the last row at the bottom border
            pl.BlockSpec(
                (1, 1, w, c),
                lambda i, j: (i, jnp.minimum((j + 1) * hb, h - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * hb, 2 * w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, x, x)


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
