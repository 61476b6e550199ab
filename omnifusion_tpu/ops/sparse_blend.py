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

import jax
import jax.numpy as jnp
import numpy as np


def _pad_leading(s: jnp.ndarray, min_bytes: int):
    """Zero-pad the leading dim of (D, N) up to ``min_bytes`` of leading
    bytes — the TPU gather's vectorized fast path is gated on leading-dim
    BYTES, not elements (PERF_NOTES machine calibration: ~256 B of total
    leading dim; quad-packed operands carry 4 blocks, so each block needs
    64 B).  Returns (padded, d_pad)."""
    d = s.shape[0]
    min_lead = max(1, min_bytes // jnp.dtype(s.dtype).itemsize)
    if 0 < d < min_lead:
        s = jnp.concatenate([s, jnp.zeros((min_lead - d, s.shape[1]), s.dtype)], axis=0)
        return s, min_lead
    return s, d


def quad_gather_blend(
    src_flat: jnp.ndarray,
    idx: jnp.ndarray,
    w4: jnp.ndarray,
    row_stride: int,
    channel_first: bool = False,
) -> jnp.ndarray:
    """Bilinear-quad gather-blend: one fetch per (output pixel, source patch).

    TPU gathers cost ~6ns per fetched slice regardless of width, so the
    per-CORNER gather (4 fetches per sample) is 4x slower than fetching the
    whole 2x2 bilinear quad at once.  The source is packed with three rolled
    copies so each quad [I[y0,x0], I[y0,x0+1], I[y1,x0], I[y1,x0+1]] is one
    contiguous slice; border-clamped corners must have their weight FOLDED
    into the surviving corner at table-build time (the rolled values wrap
    across row/patch boundaries there and carry zero weight).

    Args:
      src_flat: (B, N_in, C).
      idx: (N_out, K) int32 flat index of each quad's top-left corner.
      w4: (N_out, K, 4) weights in [w00, w01, w10, w11] order.
      row_stride: flat-index distance between vertically adjacent pixels.
      channel_first: src is (B, C, N_in), result (B, C, N_out) — skips both
        relayout transposes (see capped_quad_gather_blend).

    Returns:
      (B, N_out, C), or (B, C, N_out) when ``channel_first``.
    """
    if channel_first:
        b, c, n_in = src_flat.shape
        s = src_flat.reshape(b * c, n_in)
    else:
        b, n_in, c = src_flat.shape
        # channels ride in the batch dim: minor dims stay tiny and fusable
        s = src_flat.transpose(0, 2, 1).reshape(b * c, n_in)
    n_out, k = idx.shape
    d = b * c
    # XLA's TPU gather switches to a vectorized fast path once the operand's
    # leading dim reaches ~256 BYTES (~10x faster per element — PERF_NOTES
    # machine calibration; the gate is bytes, not elements).  The 4 rolled
    # quad copies ride the LEADING axis, so each block only needs 64 B
    # (16 f32 / 32 bf16) with every fetched element useful (the round-1
    # layout kept the quad minor-most and padded d to 64 elements, wasting
    # 75% of the fetch at batch 8).
    s, d_pad = _pad_leading(s, 64)
    packed = jnp.concatenate(
        [
            s,
            jnp.roll(s, -1, axis=1),
            jnp.roll(s, -row_stride, axis=1),
            jnp.roll(s, -(row_stride + 1), axis=1),
        ],
        axis=0,
    )  # (4*D, N_in), quad order [00, 01, 10, 11] in leading blocks
    g = jnp.take(packed, idx.reshape(-1), axis=1).reshape(4, d_pad, n_out, k)
    out = jnp.einsum("qdnk,nkq->dn", g, w4.astype(src_flat.dtype))
    out = out[:d].reshape(b, c, n_out)
    return out if channel_first else out.transpose(0, 2, 1)


def capped_quad_gather_blend(
    src_flat: jnp.ndarray,
    idx: jnp.ndarray,
    w4: jnp.ndarray,
    tail_pix: jnp.ndarray,
    tail_idx: jnp.ndarray,
    tail_w: jnp.ndarray,
    row_stride: int,
    channel_first: bool = False,
) -> jnp.ndarray:
    """quad_gather_blend on a dense-cap + sorted-COO-tail table.

    The dense (N_out, K) quad table wastes fetches on dead slots (the
    pers2equi table is ~52% live at the flagship config: most pixels see 2
    patches, K is set by the rare 4-patch corners).  Capping the dense part
    at the per-pixel median and spilling the tail to COO (one gather +
    sorted segment_sum, same scheme as the backward's transposed tables)
    cuts gather volume ~45% — and the gather IS the merge cost on TPU
    (PERF_NOTES round-2 cost model: ~12-25 ns per index, ~0.2-0.4 ns per
    fetched element; speed-of-light HBM traffic would be ~0.1 ms).

    Args:
      src_flat: (B, N_in, C).
      idx: (N_out, CAP) int32 top-left corners (live-first per pixel).
      w4: (N_out, CAP, 4) weights.
      tail_pix: (M,) int32 sorted output pixel of each tail quad.
      tail_idx: (M,) int32 top-left corner of each tail quad.
      tail_w: (M, 4) weights.
      row_stride: flat-index distance between vertically adjacent pixels.
      channel_first: src is (B, C, N_in) and the result is (B, C, N_out) —
        skips BOTH 100+MB relayout transposes (the internal gather domain is
        (B*C, N) already); the sparse map applied is identical.

    Returns:
      (B, N_out, C), or (B, C, N_out) when ``channel_first``.
    """
    if channel_first:
        b, c, n_in = src_flat.shape
        s = src_flat.reshape(b * c, n_in)
    else:
        b, n_in, c = src_flat.shape
        s = src_flat.transpose(0, 2, 1).reshape(b * c, n_in)
    n_out, k = idx.shape
    d = b * c
    # leading-axis fast path, byte-gated (see quad_gather_blend)
    s, d_pad = _pad_leading(s, 64)
    packed = jnp.concatenate(
        [
            s,
            jnp.roll(s, -1, axis=1),
            jnp.roll(s, -row_stride, axis=1),
            jnp.roll(s, -(row_stride + 1), axis=1),
        ],
        axis=0,
    )  # (4*D, N_in)
    g = jnp.take(packed, idx.reshape(-1), axis=1).reshape(4, d_pad, n_out, k)
    out = jnp.einsum("qdnk,nkq->dn", g, w4.astype(src_flat.dtype))

    if tail_pix.shape[0]:
        gt = jnp.take(packed, tail_idx, axis=1).reshape(4, d_pad, -1)
        vals = jnp.einsum("qdm,mq->md", gt, tail_w.astype(src_flat.dtype))
        summed = jax.ops.segment_sum(
            vals, tail_pix, num_segments=n_out, indices_are_sorted=True
        )  # (N_out, D)
        out = out + summed.T

    out = out[:d].reshape(b, c, n_out)
    return out if channel_first else out.transpose(0, 2, 1)


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
    b, n_in, c = src_flat.shape
    n_out, k = idx.shape
    d = b * c
    s = src_flat.transpose(0, 2, 1).reshape(d, n_in)
    # no quad packing here: the operand alone must reach the ~256-byte gate
    s, d_pad = _pad_leading(s, 256)
    g = jnp.take(s, idx.reshape(-1), axis=1).reshape(d_pad, n_out, k)
    out = jnp.einsum("dnk,nk->dn", g, w.astype(src_flat.dtype))
    return out[:d].reshape(b, c, n_out).transpose(0, 2, 1)


def transposed_quad_gather_blend(
    cot: jnp.ndarray,
    idx_t: jnp.ndarray,
    w_t: jnp.ndarray,
    over_src: jnp.ndarray,
    over_dst: jnp.ndarray,
    over_w: jnp.ndarray,
    n_in: int,
    row_stride: int,
    channel_first: bool = False,
) -> jnp.ndarray:
    """Apply W^T to a cotangent: the backward of a static quad blend.

    The transpose of a static sparse map is another static sparse map, so
    the backward pass is a (fast-path) GATHER with precomputed transposed
    tables instead of autodiff's slow scatter-add.  Tables are in QUAD
    granularity (one gather index covers all 4 corners of a forward fetch,
    spec.build_vjp_tables): each fetched cotangent is weighted by the 4
    corner weights into 4 accumulator planes, and the corner offsets
    [0, 1, W, W+1] are applied as 3 cheap rolls at the end.  Fan-in per
    input quad is capped in ``idx_t``/``w_t``; the heavy tail (border pixels
    of pole patches that absorb clamp-folded weights) lives in a sorted COO
    overflow handled by one gather + segment_sum.

    Args:
      cot: (B, N_out, C) cotangent.
      idx_t: (N_in, K_T) int32 output-pixel indices.
      w_t: (N_in, K_T, 4) quad weights (0 = padding).
      over_src: (M,) int32 indices into N_out (sorted by over_dst).
      over_dst: (M,) int32 indices into N_in.
      over_w: (M, 4) quad weights.
      row_stride: flat-index distance between vertically adjacent pixels.
      channel_first: cotangent comes in as (B, C, N_out) and the result is
        (B, C, N_in) — the layout the channel-first forward's VJP needs.

    Returns:
      (B, N_in, C) cotangent for the source, or (B, C, N_in) when
      ``channel_first``.
    """
    if channel_first:
        b, c, n_out = cot.shape
        g2 = cot.reshape(b * c, n_out)
    else:
        b, n_out, c = cot.shape
        g2 = cot.transpose(0, 2, 1).reshape(b * c, n_out)
    k_t = idx_t.shape[1]
    d = b * c
    # no quad packing here: the operand alone must reach the ~256-byte gate
    g2, d_pad = _pad_leading(g2, 256)
    g = jnp.take(g2, idx_t.reshape(-1), axis=1).reshape(d_pad, n_in, k_t)
    # HIGHEST precision: on TPU the default lowers this K_T-term contraction
    # to bf16 MXU passes, which puts ~4e-3 RELATIVE rounding on every
    # gradient — the round-3 "pallas backward FAIL at 1.67e-2" turned out to
    # be exactly this noise ON THE REFERENCE SIDE (the exact-f32 VPU kernel
    # disagreed with the bf16 einsum; interpret mode agreed because CPU
    # einsums are f32).  The contraction is memory-bound (K_T<=8 terms), so
    # exact passes are ~free; torch computes these gradients in f32.
    blocks = jnp.einsum(
        "dnk,nkq->qdn", g, w_t.astype(cot.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )  # (4, D, N_in)

    if over_src.shape[0]:
        vals = jnp.take(g2, over_src, axis=1)  # (D, M)
        contrib = vals[:, :, None] * over_w[None, :, :].astype(cot.dtype)  # (D, M, 4)
        summed = jax.ops.segment_sum(
            contrib.transpose(1, 0, 2).reshape(-1, d_pad * 4),
            over_dst,
            num_segments=n_in,
            indices_are_sorted=True,
        )  # (N_in, D*4)
        blocks = blocks + summed.reshape(n_in, d_pad, 4).transpose(2, 1, 0)

    out = (
        blocks[0]
        + jnp.roll(blocks[1], 1, axis=-1)
        + jnp.roll(blocks[2], row_stride, axis=-1)
        + jnp.roll(blocks[3], row_stride + 1, axis=-1)
    )
    out = out[:d].reshape(b, c, n_in)
    return out if channel_first else out.transpose(0, 2, 1)


def quad_gather_blend_with_vjp(
    src_flat, idx, w4, row_stride: int, vjp_tables, capped=None, channel_first=False,
    impl: str = "xla",
) -> jnp.ndarray:
    """quad_gather_blend with a custom backward using transposed tables.

    When ``capped`` tables are given (spec.build_capped_tables) the forward
    runs capped_quad_gather_blend — the identical sparse map re-packed with
    less gather volume, so the one transposed backward serves both.

    ``channel_first``: src is (B, C, N_in), result (B, C, N_out), and the
    backward stays channel-first end to end — no relayout transposes
    anywhere on the sparse-map path.

    ``impl="pallas"``: run the forward through the index-major Pallas
    blend-reduce (ops.pallas_blend) — identical sparse map, no retile or
    blend-einsum copies.  Requires channel_first+capped tables (or
    channel-last uncapped for the K=1 e2p shape), batch*channel >= 128
    (the kernel pads D to lane width internally; below one full vector the
    padding outweighs the saved movement), and kernel blocks that fit the
    ~16 MB/core VMEM budget; silently falls back to the XLA path otherwise
    (so callers can request it unconditionally).
    The custom VJP below serves both forwards, so autodiff never has to
    differentiate through the kernel.  The BACKWARD stays on the XLA
    transposed-table path: ``impl="pallas"`` can never corrupt gradients.

    ``impl="pallas_full"``: additionally route the backward through the
    Pallas transposed kernel.  GATED separately because the round-3 kernel
    was numerically wrong on real mosaic while its interpret-mode test
    passed (measurements.log 2026-08-18); promote only behind a green
    tools/verify_kernels.py run on the chip.

    Dtype caveat for 16-bit sources: the pallas channel-first forward
    returns the f32 accumulator (more precise; consumers upcast anyway)
    while the XLA path — and therefore the narrow-batch fallback — keeps
    the source dtype.  Don't key behavior on the output dtype."""
    n_in = src_flat.shape[2] if channel_first else src_flat.shape[1]

    if impl in ("pallas", "pallas_full"):
        b = src_flat.shape[0]
        c = src_flat.shape[1] if channel_first else src_flat.shape[2]

        def _vmem_ok(k_slots: int) -> bool:
            # Per grid step the d-major kernel holds (double-buffered) K
            # (4*d_pad, BLK) gather blocks at source width, a
            # (4K, blk) f32 weight block, a (d_pad, blk) f32 output block
            # (double-buffered), and the f32 accumulator/decode temps.
            # Gate against the ~16 MB/core VMEM budget; larger configs
            # (wide batch x cap-K merges) take the XLA path instead of
            # failing Mosaic compilation on the chip.
            from omnifusion_tpu.ops.pallas_blend import BLK

            d_pad = -(-(b * c) // 8) * 8
            isz = src_flat.dtype.itemsize
            blk = BLK
            est = 2 * k_slots * 4 * d_pad * blk * isz  # gather blocks
            est += 2 * d_pad * blk * 4  # output blocks
            est += 6 * d_pad * blk * 4  # acc + decode temps
            return est < 12e6

        # below one full 128-lane vector the kernel's lane padding outweighs
        # the removed data movement; stay on the XLA path
        if (
            b * c >= 128
            and channel_first
            and capped is not None
            and _vmem_ok(np.asarray(capped[0]).shape[1])
        ):
            from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas

            idx_c, w_c, tail_pix, tail_idx, tail_w = capped

            def _forward(src):
                return quad_gather_blend_pallas(
                    src, idx_c, w_c, tail_pix, tail_idx, tail_w, row_stride
                )

            return _with_table_vjp(
                _forward, src_flat, vjp_tables, n_in, row_stride, True, impl
            )
        if b * c >= 128 and not channel_first and capped is None and _vmem_ok(1):
            from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas_cl

            def _forward(src):
                return quad_gather_blend_pallas_cl(src, idx, w4, row_stride)

            return _with_table_vjp(
                _forward, src_flat, vjp_tables, n_in, row_stride, False, impl
            )

    if capped is not None:
        idx_c, w_c, tail_pix, tail_idx, tail_w = capped

        def _forward(src):
            return capped_quad_gather_blend(
                src, idx_c, w_c, tail_pix, tail_idx, tail_w, row_stride,
                channel_first=channel_first,
            )
    else:

        def _forward(src):
            return quad_gather_blend(src, idx, w4, row_stride, channel_first=channel_first)

    return _with_table_vjp(
        _forward, src_flat, vjp_tables, n_in, row_stride, channel_first
    )


def _with_table_vjp(
    _forward, src_flat, vjp_tables, n_in, row_stride, channel_first, impl="xla"
):
    @jax.custom_vjp
    def op(src):
        return _forward(src)

    def fwd(src):
        return _forward(src), None

    src_dtype = src_flat.dtype

    def bwd(_, cot):
        # tables materialize only when a backward is actually traced
        b = cot.shape[0]
        c = cot.shape[1] if channel_first else cot.shape[2]
        if impl == "pallas_full" and b * c >= 128:
            from omnifusion_tpu.ops.pallas_blend import (
                transposed_quad_gather_blend_pallas,
            )

            idx_t, w_t, over_src, over_dst, over_w = vjp_tables
            out = transposed_quad_gather_blend_pallas(
                cot, idx_t, w_t, over_src, over_dst, over_w, n_in, row_stride,
                channel_first=channel_first,
            )
        else:
            idx_t, w_t, over_src, over_dst, over_w = (
                jnp.asarray(t) for t in vjp_tables
            )
            out = transposed_quad_gather_blend(
                cot, idx_t, w_t, over_src, over_dst, over_w, n_in, row_stride,
                channel_first=channel_first,
            )
        # the pallas paths emit f32 from lower-precision sources; the
        # cotangent must come back in the primal's dtype
        return (out.astype(src_dtype),)

    op.defvjp(fwd, bwd)
    return op(src_flat)
