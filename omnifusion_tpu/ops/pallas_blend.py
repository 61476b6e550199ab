"""Pallas TPU kernel for the post-gather quad blend-reduce.

The round-3 xplane profile of the b=64 flagship forward showed that the
pers2equi merge's cost is NOT the gather itself (~8-16 ms at ~260 GB/s) but
the data movement XLA schedules around it: a retiling reshape of the gather
result, the blend einsum's operand copies, and the output relayout
transposes (PERF_NOTES.md round-2/3 profiles; the reference's equivalent is
the advanced-index gather + masked normalize of pers2equi_v3.py:171-196).

This module removes all of it:

  * the gather is expressed INDEX-MAJOR — operand ``(N_in, 4*D)``, result
    ``(M, 4*D)`` — which is the physical layout XLA's layout assignment
    already chose for the merge gather (operand {0,1}, result {1,0} in the
    profile), so the logical program finally matches the physical one and
    no retile is needed;
  * a Pallas kernel (``_blend_kernel``) consumes the gather result directly
    from VMEM blocks and does the weighted quad reduction in f32 on the VPU,
    writing ``(N_out, D)`` — zero intermediate copies.

The kernel pads D (the batch*channel dim) up to a full 128-lane multiple;
very narrow callers take the XLA path in sparse_blend.py instead (the
auto-fallback there keeps the padded-fetch waste bounded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _f16_bits_to_f32(x16):
    """float16 riding as int16 BITS -> exact f32, integer-decoded on the VPU.

    Mosaic has no f16 vector type (remote-compile rejects kernels with
    'Unsupported type in mosaic dialect: f16'), so f16 operands enter the
    kernel bitcast to int16 and the float decode happens here: normals by
    exponent re-bias straight into f32 bits, subnormals exactly as
    sign * m * 2^-24, e=31 re-biased to 255 so inf/nan propagate (the f16
    quiet bit lands on the f32 quiet bit under m << 13).  Bit-exact over
    ALL 65536 patterns vs numpy's f16->f32 convert
    (tests/test_pallas_blend.py::test_f16_decode_exhaustive) — a diverging
    head output that overflows f16 must blow up the same way on both
    impls, not decode to finite garbage."""
    x = x16.astype(jnp.int32) & 0xFFFF
    s = x >> 15
    e = (x >> 10) & 0x1F
    m = x & 0x3FF
    normal = jax.lax.bitcast_convert_type(
        (s << 31) | (jnp.where(e == 31, 255, e + 112) << 23) | (m << 13),
        jnp.float32,
    )
    sub = (1 - 2 * s).astype(jnp.float32) * m.astype(jnp.float32) * jnp.float32(2.0**-24)
    return jnp.where(e > 0, normal, sub)


def _to_f32(v):
    return _f16_bits_to_f32(v) if v.dtype == jnp.int16 else v.astype(jnp.float32)


def _blend_kernel(g_ref, w_ref, o_ref, *, K: int, D: int):
    # Mosaic-friendly: no vector shape casts anywhere — the (K, 4) reduction
    # unrolls into static slices (g) and lane-broadcast columns (w).  (An
    # earlier (blk, K*4) -> (blk, K, 4, 1) reshape of the weights was
    # rejected by infer-vector-layout on real TPU.)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(K):
        for q in range(4):
            wcol = w_ref[:, k * 4 + q : k * 4 + q + 1]  # (blk, 1) f32
            g = _to_f32(g_ref[k, :, q * D : (q + 1) * D])  # (blk, D)
            acc = acc + g * wcol
    o_ref[:] = acc.astype(o_ref.dtype)


def blend_reduce(
    g3: jnp.ndarray,
    w4: jnp.ndarray,
    blk: int = 256,
    interpret=None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """(K, N_pad, 4*D) k-major gather rows + (N_pad, K, 4) f32 weights ->
    (N_pad, D) in ``out_dtype`` (accumulation is always f32 on the VPU).

    int16 gather rows are interpreted as float16 BITS and integer-decoded
    in-kernel (mosaic has no f16 vector type)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else (CPU test meshes, the
        # driver's virtual-device dryrun) run the kernel interpreted
        interpret = jax.default_backend() != "tpu"

    k, n_pad, r = g3.shape
    d = r // 4
    assert n_pad % blk == 0, (g3.shape, blk)
    return pl.pallas_call(
        functools.partial(_blend_kernel, K=k, D=d),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), out_dtype),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((k, blk, r), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k * 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g3, w4.reshape(n_pad, k * 4).astype(jnp.float32))


def _gather_blend_pixel_major(
    src_cf, idx, w4, tail_pix, tail_idx, tail_w, row_stride, blk, interpret,
    out_dtype=jnp.float32,
):
    """Shared core: (B, C, N_in) channel-first source -> (N_out, D=B*C)
    pixel-major result in ``out_dtype`` (padding stripped from N_out, not
    yet from D)."""
    b, c, n_in = src_cf.shape
    s = src_cf.reshape(b * c, n_in)
    if s.dtype == jnp.float16:
        # Mosaic can't type f16; ship the BITS (same-width bitcast is free,
        # the gather is dtype-agnostic) and decode in-kernel (_f16_bits_to_f32).
        # The barrier pins the bitcast to THIS 2D view: without it XLA hoists
        # the bitcast above the caller's (B,N,C)->(B,C,N) relayout and assigns
        # the s16 temp a minor-dim-3 tiled layout whose T(8,128) padding
        # expands 192 MB to 8 GB and OOMs HBM (measurements.log 2026-08-18,
        # pallas_merge_micro e2p at b=64).
        s = jax.lax.optimization_barrier(s)
        s = jax.lax.bitcast_convert_type(s, jnp.int16)
    # pad D straight to a full 128-lane multiple (which also clears the XLA
    # gather's 64-byte leading-dim fast-path gate by a wide margin)
    d_pad = -(-(b * c) // 128) * 128
    if d_pad > b * c:
        s = jnp.concatenate(
            [s, jnp.zeros((d_pad - b * c, n_in), s.dtype)], axis=0
        )
    st = s.T  # layout-only: XLA assigns the pack's physical layout d-minor anyway
    packed = jnp.concatenate(
        [
            st,
            jnp.roll(st, -1, axis=0),
            jnp.roll(st, -row_stride, axis=0),
            jnp.roll(st, -(row_stride + 1), axis=0),
        ],
        axis=1,
    )  # (N_in, 4*D) — quad corner blocks ride the minor dim, d-minor

    idx = np.asarray(idx)
    w4 = np.asarray(w4, np.float32)
    n_out, k = idx.shape
    pad = -n_out % blk
    if pad:
        idx = np.concatenate([idx, np.zeros((pad, k), idx.dtype)])
        w4 = np.concatenate([w4, np.zeros((pad, k, 4), w4.dtype)])

    # k-major flattening: the kernel block sees slot k as a static leading
    # index (no strided row access, no vector reshapes)
    g = jnp.take(packed, idx.T.reshape(-1), axis=0).reshape(k, -1, packed.shape[1])
    out = blend_reduce(
        g, jnp.asarray(w4), blk=blk, interpret=interpret, out_dtype=out_dtype
    )
    out = out[:n_out]  # (N_out, D)

    if tail_pix is not None and tail_pix.shape[0]:
        gt = jnp.take(packed, jnp.asarray(tail_idx), axis=0)  # (M, 4*D)
        if gt.dtype == jnp.int16:  # f16 bits; XLA decodes fine outside mosaic
            gt = jax.lax.bitcast_convert_type(gt, jnp.float16)
        tw = jnp.asarray(np.asarray(tail_w, np.float32))
        tv = jnp.sum(
            gt.reshape(-1, 4, d_pad).astype(jnp.float32) * tw[:, :, None], axis=1
        )  # (M, D) — layout-matched with the kernel output, no transpose
        out = out + jax.ops.segment_sum(
            tv, jnp.asarray(tail_pix), num_segments=n_out, indices_are_sorted=True
        ).astype(out.dtype)
    return out


def quad_gather_blend_pallas(
    src_cf: jnp.ndarray,
    idx: np.ndarray,
    w4: np.ndarray,
    tail_pix,
    tail_idx,
    tail_w,
    row_stride: int,
    blk: int = 256,
    interpret=None,
) -> jnp.ndarray:
    """Channel-first quad gather-blend with the Pallas blend-reduce.

    Same sparse map as sparse_blend.capped_quad_gather_blend (capped dense
    + sorted-COO tail), index-major formulation.  src (B, C, N_in) ->
    (B, C, N_out).

    Dtype convention: the result is the kernel's f32 accumulator as-is —
    for 16-bit sources this is MORE precise than the XLA path (which
    rounds its output back to the source dtype), and consumers of the
    merge (models.confidence_merge) upcast before the division anyway.
    The custom VJP (sparse_blend._with_table_vjp) re-casts cotangents to
    the primal dtype, so autodiff is unaffected.  Callers that key on the
    output dtype must not: the XLA fallback below one lane vector keeps
    the source dtype instead.
    """
    b, c, n_in = src_cf.shape
    out = _gather_blend_pixel_major(
        src_cf, idx, w4, tail_pix, tail_idx, tail_w, row_stride, blk, interpret
    )
    n_out = out.shape[0]
    return out[:, : b * c].T.reshape(b, c, n_out)


def _vjp_spread_kernel(g_ref, w_ref, o_ref, *, K: int, D: int):
    # backward of the quad blend: each fetched cotangent row (D wide) is
    # weighted into 4 corner planes — out[n, q*D:(q+1)*D] = sum_k w[n,k,q]*g[k,n,d].
    #
    # STORE PATTERN MATTERS ON REAL MOSAIC: the round-3 version stored each
    # q-plane separately (o_ref[:, q*D:(q+1)*D] = acc) and was numerically
    # WRONG on the chip (verify_kernels FAIL at max|delta|=1.67e-2,
    # tools/measurements.log 2026-08-18) while passing interpret mode.  This
    # version mirrors the forward kernel's PROVEN single full-block store:
    # build all four planes in registers, write o_ref once, lane-concatenated.
    accs = [jnp.zeros((o_ref.shape[0], D), jnp.float32) for _ in range(4)]
    for k in range(K):
        g = _to_f32(g_ref[k])  # (blk, D), read once per k
        for q in range(4):
            accs[q] = accs[q] + g * w_ref[:, k * 4 + q : k * 4 + q + 1]
    o_ref[:] = jnp.concatenate(accs, axis=1).astype(o_ref.dtype)


def spread_4plane(
    g3: jnp.ndarray, w_t2: jnp.ndarray, blk: int = 256, interpret=None
) -> jnp.ndarray:
    """(K, N_pad, D) fetched cotangent rows + (N_pad, K*4) f32 weights ->
    (N_pad, 4*D) corner planes: out[n, q*D:(q+1)*D] = sum_k w[n,k*4+q]*g[k,n].

    The backward kernel as a standalone callable so tools/verify_kernels.py
    can bisect it against jnp.einsum on IDENTICAL operands (kernel
    miscompile vs glue/table error)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_t, n_pad, d_pad = g3.shape
    assert n_pad % blk == 0 and w_t2.shape == (n_pad, k_t * 4), (g3.shape, w_t2.shape)
    return pl.pallas_call(
        functools.partial(_vjp_spread_kernel, K=k_t, D=d_pad),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4 * d_pad), jnp.float32),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((k_t, blk, d_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k_t * 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 4 * d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g3, w_t2)


def transposed_quad_gather_blend_pallas(
    cot: jnp.ndarray,
    idx_t: np.ndarray,
    w_t: np.ndarray,
    over_src,
    over_dst,
    over_w,
    n_in: int,
    row_stride: int,
    channel_first: bool = False,
    blk: int = 256,
    interpret=None,
) -> jnp.ndarray:
    """Index-major Pallas backward: apply W^T to a cotangent.

    Same transposed quad tables as sparse_blend.transposed_quad_gather_blend
    (fan-in-capped dense + sorted-COO overflow, corner offsets recovered by
    3 rolls), with the gather expressed index-major and the 4-plane weight
    spread done in a kernel — no retile, no einsum operand copies.

    cot: (B, N_out, C), or (B, C, N_out) when ``channel_first``.
    Returns the source cotangent in the same convention.
    """
    if cot.dtype == jnp.float16:  # mosaic has no f16; exact upcast
        cot = cot.astype(jnp.float32)
    if channel_first:
        b, c, n_out = cot.shape
        g2 = cot.reshape(b * c, n_out)
    else:
        b, n_out, c = cot.shape
        g2 = cot.transpose(0, 2, 1).reshape(b * c, n_out)
    d = b * c
    d_pad = -(-d // 128) * 128
    if d_pad > d:
        g2 = jnp.concatenate([g2, jnp.zeros((d_pad - d, n_out), g2.dtype)], axis=0)
    ct = g2.T  # (N_out, D) index-major; layout-only

    idx_t = np.asarray(idx_t)
    w_t = np.asarray(w_t, np.float32)
    n_rows, k_t = idx_t.shape
    assert n_rows == n_in, (idx_t.shape, n_in)
    pad = -n_in % blk
    if pad:
        idx_t = np.concatenate([idx_t, np.zeros((pad, k_t), idx_t.dtype)])
        w_t = np.concatenate([w_t, np.zeros((pad, k_t, 4), w_t.dtype)])
    n_pad = n_in + pad

    g3 = jnp.take(ct, idx_t.T.reshape(-1), axis=0).reshape(k_t, n_pad, d_pad)
    out4 = spread_4plane(
        g3, jnp.asarray(w_t.reshape(n_pad, k_t * 4)), blk=blk, interpret=interpret
    )
    out4 = out4[:n_in]  # (N_in, 4D)

    if over_src is not None and np.asarray(over_src).shape[0]:
        vals = jnp.take(ct, jnp.asarray(over_src), axis=0)  # (M, D)
        ow = jnp.asarray(np.asarray(over_w, np.float32))  # (M, 4)
        contrib = (
            vals.astype(jnp.float32)[:, None, :] * ow[:, :, None]
        ).reshape(-1, 4 * d_pad)
        out4 = out4 + jax.ops.segment_sum(
            contrib, jnp.asarray(over_dst), num_segments=n_in, indices_are_sorted=True
        )

    # corner offsets [0, 1, W, W+1] recovered by rolls on the PIXEL axis
    out = (
        out4[:, :d_pad]
        + jnp.roll(out4[:, d_pad : 2 * d_pad], 1, axis=0)
        + jnp.roll(out4[:, 2 * d_pad : 3 * d_pad], row_stride, axis=0)
        + jnp.roll(out4[:, 3 * d_pad :], row_stride + 1, axis=0)
    )
    out = out[:, :d].T.reshape(b, c, n_in)
    return out if channel_first else out.transpose(0, 2, 1)


def quad_gather_blend_pallas_cl(
    src_flat: jnp.ndarray,
    idx: np.ndarray,
    w4: np.ndarray,
    row_stride: int,
    blk: int = 256,
    interpret=None,
) -> jnp.ndarray:
    """Channel-LAST wrapper: (B, N_in, C) -> (B, N_out, C).

    For the equi2pers direction (K=1, no COO tail), whose consumers (the
    conv trunk) want channel-last patch stacks.  The kernel output arrives
    pixel-major (N_out, B, C); one (1,0,2) transpose lands it channel-last —
    cheaper than the XLA path's retile + blend copies it replaces.
    """
    b, n_in, c = src_flat.shape
    src_cf = src_flat.transpose(0, 2, 1)  # same relayout the XLA path does
    # mosaic can't type f16 output refs either: emit f32 and convert outside
    out_dtype = jnp.float32 if src_flat.dtype == jnp.float16 else src_flat.dtype
    out = _gather_blend_pixel_major(
        src_cf, idx, w4, None, None, None, row_stride, blk, interpret,
        out_dtype=out_dtype,
    ).astype(src_flat.dtype)
    n_out = out.shape[0]
    out = out[:, : b * c].reshape(n_out, b, c)
    return out.transpose(1, 0, 2)
