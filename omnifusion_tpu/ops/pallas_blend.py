"""Pallas TPU kernels for the post-gather quad blend-reduce (d-major).

The round-3 xplane profile of the b=64 flagship forward showed that the
pers2equi merge's cost is NOT the gather itself (~16 ms at the measured
random-row rate) but the data movement XLA schedules around it: operand
copies feeding the blend einsum, a retiling reshape of the gather result,
and output relayout transposes (PERF_NOTES.md round-2/3 profiles; the
reference's equivalent is the advanced-index gather + masked normalize of
pers2equi_v3.py:171-196).

Round-4 redesign — D-MAJOR end to end.  The first (round-3) kernel consumed
the gather result PIXEL-major ((M, 4D) rows), but the chipless AOT compile
of that graph shows XLA materializing a 1.07 GB transpose between the
gather and the kernel, plus a pre-pack and an output transpose: the TPU
gather's native layouts are operand {0,1} / result {1,0} in the (4D, N)
column-gather formulation — d-major, the exact layout the XLA einsum path
uses.  So the kernels now consume it directly:

  * pack: (4*D, N_in) quad-packed source, corner blocks on the LEADING
    axis (identical to ops/sparse_blend.py's proven pack — one fused pass);
  * one column gather PER K-SLOT: (4*D, N_pad) each — same index count and
    bytes as the single k-major gather, but the result feeds the kernel's
    (4*D, blk) blocks with NO reshape, NO transpose;
  * the kernel blends on the VPU in f32 and writes (D, blk) blocks of the
    (D, N_out) CHANNEL-FIRST result — which is what the confidence merge
    consumes, so the output transpose disappears too.

f16 sources ride as int16 bits with an exact in-kernel integer decode
(mosaic has no f16 vector type — see _f16_bits_to_f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Lane-block width for every d-major kernel below.  sparse_blend._vmem_ok
# gates pallas routing against THIS value — change it here and the VMEM
# estimate follows (ADVICE r4: four independent blk=512 defaults let the
# gate silently desync from the kernels).
BLK = 512


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


def _sublane_mult(dtype) -> int:
    """Minimum sublane multiple for a dtype's VMEM tile (f32 8, 16-bit 16)."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _dm_blend_kernel(*refs, K: int, D: int):
    """g_k (4D, blk) quad-packed columns + w (K*4, blk) -> o (D, blk):
    o[d, n] = sum_{k,q} w[k*4+q, n] * g_k[q*D+d, n].  All f32 on the VPU;
    every store is one full block (the only store pattern verified exact on
    real mosaic — see tools/verify_kernels.py history)."""
    g_refs, w_ref, o_ref = refs[:K], refs[K], refs[K + 1]
    acc = jnp.zeros(o_ref.shape, jnp.float32)  # (D, blk)
    for k in range(K):
        g = _to_f32(g_refs[k][:])  # (4D, blk), read once per k
        for q in range(4):
            acc = acc + g[q * D : (q + 1) * D] * w_ref[k * 4 + q : k * 4 + q + 1, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def _dm_spread_kernel(*refs, K: int, D: int):
    """Backward: g_k (D, blk) cotangent columns + w (K*4, blk) ->
    o (4D, blk): o[q*D+d, n] = sum_k w[k*4+q, n] * g_k[d, n].  Planes are
    accumulated in registers and stored ONCE, sublane-concatenated."""
    g_refs, w_ref, o_ref = refs[:K], refs[K], refs[K + 1]
    accs = [jnp.zeros((D, o_ref.shape[1]), jnp.float32) for _ in range(4)]
    for k in range(K):
        g = _to_f32(g_refs[k][:])  # (D, blk), read once per k
        for q in range(4):
            accs[q] = accs[q] + g * w_ref[k * 4 + q : k * 4 + q + 1, :]
    o_ref[:] = jnp.concatenate(accs, axis=0).astype(o_ref.dtype)


def _dm_call(kernel, gs, w2, out_rows, blk, interpret, out_dtype=jnp.float32):
    """Shared pallas_call plumbing: K d-major operands (R, N_pad) + weights
    (K*4, N_pad) -> (out_rows, N_pad), gridded over N in blk-lane blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else (CPU test meshes, the
        # driver's virtual-device dryrun) run the kernel interpreted
        interpret = jax.default_backend() != "tpu"

    k = len(gs)
    n_pad = gs[0].shape[1]
    assert n_pad % blk == 0 and w2.shape == (k * 4, n_pad), (
        [g.shape for g in gs], w2.shape, blk,
    )
    g_specs = [
        pl.BlockSpec((g.shape[0], blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        for g in gs
    ]
    w_spec = pl.BlockSpec((k * 4, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, n_pad), out_dtype),
        grid=(n_pad // blk,),
        in_specs=g_specs + [w_spec],
        out_specs=pl.BlockSpec((out_rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*gs, w2)


def blend_reduce(
    gs, w2, interpret=None, out_dtype=jnp.float32, blk: int = BLK
) -> jnp.ndarray:
    """K d-major gather results [(4D, N_pad)] + (K*4, N_pad) f32 weights ->
    (D, N_pad) in ``out_dtype`` (accumulation is always f32 on the VPU).

    int16 operands are interpreted as float16 BITS and integer-decoded
    in-kernel (mosaic has no f16 vector type)."""
    d = gs[0].shape[0] // 4
    kern = functools.partial(_dm_blend_kernel, K=len(gs), D=d)
    return _dm_call(kern, list(gs), w2, d, blk, interpret, out_dtype)


def spread_4plane(gs, w2, interpret=None, blk: int = BLK) -> jnp.ndarray:
    """K d-major cotangent fetches [(D, N_pad)] + (K*4, N_pad) f32 weights
    -> (4D, N_pad) corner planes: out[q*D+d, n] = sum_k w[k*4+q, n]*g_k[d, n].

    The backward kernel as a standalone callable so tools/verify_kernels.py
    can bisect it against jnp.einsum on IDENTICAL operands (kernel
    miscompile vs glue/table error vs reference-precision noise)."""
    d = gs[0].shape[0]
    kern = functools.partial(_dm_spread_kernel, K=len(gs), D=d)
    return _dm_call(kern, list(gs), w2, 4 * d, blk, interpret)


def _pack_dmajor(src_cf, row_stride):
    """(B, C, N_in) -> quad-packed (4*Dp, N_in) d-major source (+ Dp).

    Identical pack to ops/sparse_blend.py (corner blocks on the leading
    axis, one fused XLA pass); rows pad to the dtype's sublane tile so the
    kernel's (4*Dp, blk) blocks are layout-exact.  f16 ships as int16 BITS
    (bitcast pinned to this 2D view — hoisting it above the caller's
    relayout once gave the s16 temp a minor-dim-3 tiled layout with 42.7x
    padding and an 8 GB HBM OOM, measurements.log 2026-08-18)."""
    b, c, n_in = src_cf.shape
    s = src_cf.reshape(b * c, n_in)
    if s.dtype == jnp.float16:
        s = jax.lax.optimization_barrier(s)
        s = jax.lax.bitcast_convert_type(s, jnp.int16)
    d_pad = -(-(b * c) // _sublane_mult(s.dtype)) * _sublane_mult(s.dtype)
    if d_pad > b * c:
        s = jnp.concatenate([s, jnp.zeros((d_pad - b * c, n_in), s.dtype)], axis=0)
    packed = jnp.concatenate(
        [
            s,
            jnp.roll(s, -1, axis=1),
            jnp.roll(s, -row_stride, axis=1),
            jnp.roll(s, -(row_stride + 1), axis=1),
        ],
        axis=0,
    )  # (4*Dp, N_in), quad order [00, 01, 10, 11] in leading blocks
    return packed, d_pad


def _pad_cols(a: np.ndarray, blk: int):
    n = a.shape[0]
    pad = -n % blk
    if pad:
        a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
    return a, n + pad


def _scatter_add_cols(out, pix, updates):
    """out (R, N) += updates (M, R) at columns pix (M, sorted) — the d-major
    equivalent of the sorted-COO segment_sum, no (R, N)-sized transposes."""
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,),
    )
    return jax.lax.scatter_add(
        out,
        jnp.asarray(pix)[:, None],
        updates.astype(out.dtype),
        dnums,
        indices_are_sorted=True,
        unique_indices=False,
    )


def quad_gather_blend_pallas(
    src_cf: jnp.ndarray,
    idx: np.ndarray,
    w4: np.ndarray,
    tail_pix,
    tail_idx,
    tail_w,
    row_stride: int,
    blk: int = BLK,
    interpret=None,
) -> jnp.ndarray:
    """Channel-first quad gather-blend with the d-major Pallas blend-reduce.

    Same sparse map as sparse_blend.capped_quad_gather_blend (capped dense
    + sorted-COO tail).  src (B, C, N_in) -> (B, C, N_out) with zero
    relayout transposes: the pack, the per-k column gathers, the kernel
    blocks, and the channel-first output all live in the same d-major
    layout XLA's own layout assignment picks for this gather.

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
    packed, d_pad = _pack_dmajor(src_cf, row_stride)

    idx = np.asarray(idx)
    w4 = np.asarray(w4, np.float32)
    n_out, k = idx.shape
    idx_p, n_pad = _pad_cols(idx, blk)
    w4_p, _ = _pad_cols(w4, blk)

    gs = [jnp.take(packed, jnp.asarray(idx_p[:, j]), axis=1) for j in range(k)]
    w2 = jnp.asarray(np.ascontiguousarray(w4_p.reshape(n_pad, k * 4).T))
    out = blend_reduce(gs, w2, interpret=interpret, blk=blk)  # (Dp, N_pad)

    if tail_pix is not None and tail_pix.shape[0]:
        gt = jnp.take(packed, jnp.asarray(tail_idx), axis=1)  # (4Dp, M)
        if gt.dtype == jnp.int16:  # f16 bits; XLA decodes fine outside mosaic
            gt = jax.lax.bitcast_convert_type(gt, jnp.float16)
        gt = gt.astype(jnp.float32)
        twt = jnp.asarray(np.asarray(tail_w, np.float32).T)  # (4, M)
        tv = sum(
            gt[q * d_pad : (q + 1) * d_pad] * twt[q : q + 1, :] for q in range(4)
        )  # (Dp, M)
        out = _scatter_add_cols(out, tail_pix, tv.T)

    return out[: b * c, :n_out].reshape(b, c, n_out)


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
    blk: int = BLK,
    interpret=None,
) -> jnp.ndarray:
    """d-major Pallas backward: apply W^T to a cotangent.

    Same transposed quad tables as sparse_blend.transposed_quad_gather_blend
    (fan-in-capped dense + sorted-COO overflow, corner offsets recovered by
    3 rolls), with the per-k cotangent gathers, the 4-plane weight spread,
    and the roll-reduce all in the d-major channel-first domain — no
    retile, no einsum operand copies, no relayout transposes.

    cot: (B, N_out, C), or (B, C, N_out) when ``channel_first``.
    Returns the source cotangent in the same convention.

    Match: the exact adjoint of the reference's 4-corner gather+blend
    (pers2equi_v3.py:171-196 / grid_sample in equi2pers_v3.py:111).
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
    sm = _sublane_mult(g2.dtype)
    d_pad = -(-d // sm) * sm
    if d_pad > d:
        g2 = jnp.concatenate([g2, jnp.zeros((d_pad - d, n_out), g2.dtype)], axis=0)

    idx_t = np.asarray(idx_t)
    w_t = np.asarray(w_t, np.float32)
    n_rows, k_t = idx_t.shape
    assert n_rows == n_in, (idx_t.shape, n_in)
    idx_p, n_pad = _pad_cols(idx_t, blk)
    w_p, _ = _pad_cols(w_t, blk)

    gs = [jnp.take(g2, jnp.asarray(idx_p[:, j]), axis=1) for j in range(k_t)]
    w2 = jnp.asarray(np.ascontiguousarray(w_p.reshape(n_pad, k_t * 4).T))
    out4 = spread_4plane(gs, w2, interpret=interpret, blk=blk)  # (4Dp, N_pad)
    out4 = out4[:, :n_in]

    if over_src is not None and np.asarray(over_src).shape[0]:
        vals = jnp.take(g2, jnp.asarray(over_src), axis=1)  # (Dp, M)
        ow = jnp.asarray(np.asarray(over_w, np.float32))  # (M, 4)
        contrib = (
            vals.T.astype(jnp.float32)[:, None, :] * ow[:, :, None]
        ).reshape(-1, 4 * d_pad)  # (M, 4Dp) q-major, matching out4's rows
        out4 = _scatter_add_cols(out4, over_dst, contrib)

    # corner offsets [0, 1, W, W+1] recovered by rolls on the PIXEL axis
    out = (
        out4[:d_pad]
        + jnp.roll(out4[d_pad : 2 * d_pad], 1, axis=1)
        + jnp.roll(out4[2 * d_pad : 3 * d_pad], row_stride, axis=1)
        + jnp.roll(out4[3 * d_pad :], row_stride + 1, axis=1)
    )
    out = out[:d].reshape(b, c, n_in)
    return out if channel_first else out.transpose(0, 2, 1)


def quad_gather_blend_pallas_cl(
    src_flat: jnp.ndarray,
    idx: np.ndarray,
    w4: np.ndarray,
    row_stride: int,
    blk: int = BLK,
    interpret=None,
) -> jnp.ndarray:
    """Channel-LAST wrapper: (B, N_in, C) -> (B, N_out, C).

    For the equi2pers direction (K=1, no COO tail), whose consumers (the
    conv trunk) want channel-last patch stacks.  The kernel computes in the
    d-major domain; the one (0,2,1) transpose back to channel-last replaces
    the XLA path's retile + blend copies AND its own output transpose.
    """
    b, n_in, c = src_flat.shape
    src_cf = src_flat.transpose(0, 2, 1)  # same relayout the XLA path does
    # mosaic can't type f16 output refs either: emit f32 and convert outside
    out_dtype = jnp.float32 if src_flat.dtype == jnp.float16 else src_flat.dtype
    packed, d_pad = _pack_dmajor(src_cf, row_stride)

    idx = np.asarray(idx)
    w4 = np.asarray(w4, np.float32)
    n_out, k = idx.shape
    idx_p, n_pad = _pad_cols(idx, blk)
    w4_p, _ = _pad_cols(w4, blk)
    gs = [jnp.take(packed, jnp.asarray(idx_p[:, j]), axis=1) for j in range(k)]
    w2 = jnp.asarray(np.ascontiguousarray(w4_p.reshape(n_pad, k * 4).T))
    out = blend_reduce(gs, w2, interpret=interpret, blk=blk, out_dtype=out_dtype)
    out = out[: b * c, :n_out].astype(src_flat.dtype)
    return out.reshape(b, c, n_out).transpose(0, 2, 1)
