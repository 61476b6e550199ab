"""Merge-gather formulation shootout at wide D (round-3 VERDICT #4).

At b=64 the pers2equi merge is element/bandwidth-bound (PERF_NOTES round-2
cost model), and the production quad layout materializes a 4x rolled+packed
copy of the source every call — ~4x the source bytes written+read before the
gather even starts.  Candidate reformulations trade index count against
packing volume using XLA gather's multi-element slices (slice_sizes=(D, 2)
fetches a horizontal corner PAIR per index):

  A  production: capped dense + COO tail, 4x packed, 1 idx/quad  (slice D*4 x 1)
  A' dense uncapped (K=4), 4x packed, 1 idx/quad                 (slice D*4 x 1)
  B  dense, 2x packed (row-shifted copy), 1 idx/quad             (slice 2D x 2)
  C  dense, NO packing, 2 idx/quad (top + bottom row)            (slice D x 2)

All variants compute the identical sparse map (max |delta| printed as a
cross-check).  Timing: honest device-time protocol (scan-chained reps with a
data dependency, distinct inputs, materialized scalar — PERF_NOTES.md).

    python tools/bench_merge_variants.py --batch 64 --dtypes f32,bf16,f16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--channels", type=int, default=2, help="2 = confidence merge shape")
    ap.add_argument("--erp_size", default="512,1024")
    ap.add_argument("--patchsize", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--also_e2p", action="store_true", help="include equi2pers variants")
    ap.add_argument(
        "--slice_pair",
        action="store_true",
        help="include the slice-pair gather variants (measured dead end on "
        "TPU: minor dim 2 tiles to 128, 64x memory — see NOTE in source)",
    )
    args = ap.parse_args()

    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from omnifusion_tpu.ops.sparse_blend import (
        capped_quad_gather_blend,
        quad_gather_blend,
        _pad_leading,
    )
    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.projection.spec import (
        build_equi2pers_grids,
        build_pers2equi_grids,
    )

    h, w = (int(x) for x in args.erp_size.split(","))
    B, C = args.batch, args.channels
    spec = ProjectionSpec.create((h, w), (args.patchsize, args.patchsize), (80, 80), 4)
    p2e = build_pers2equi_grids(spec)
    P, ph, pw = spec.n_patches, spec.patch_h, spec.patch_w
    n_in = P * ph * pw
    row_stride = pw

    DT = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}

    def pair_gather(s_pad, idx_flat, slice_rows):
        """lax.gather of (slice_rows, 2) slices at column starts idx_flat.

        s_pad: (R, N + pad) with enough zero columns that no start clamps.
        Returns (slice_rows, M, 2) — offset-major leading dim, mirroring the
        production jnp.take layout ((4D, M)) so the downstream reshape along
        the leading axis stays free and the blend einsum fuses the same way
        (an index-major (M, R, 2) layout lowered to a custom-call wanting a
        256 GB scratch on TPU)."""
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(0, 2),
            collapsed_slice_dims=(),
            start_index_map=(1,),
        )
        return lax.gather(
            s_pad,
            idx_flat[:, None],
            dnums,
            slice_sizes=(slice_rows, 2),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    def to_dn(src_flat):
        b, n, c = src_flat.shape
        s = src_flat.transpose(0, 2, 1).reshape(b * c, n)
        return _pad_leading(s, 64)

    idx_d = np.asarray(p2e.idx)  # (N_out, K) dense
    w4_d = np.asarray(p2e.w4)  # (N_out, K, 4)
    n_out, K = idx_d.shape

    def variant_A(src):  # production: capped + COO tail
        ic, wc, tp, ti, tw = p2e.capped
        return capped_quad_gather_blend(src, ic, wc, tp, ti, tw, row_stride)

    def variant_Ap(src):  # dense uncapped, 4x packed
        return quad_gather_blend(src, p2e.idx, p2e.w4, row_stride)

    idx_flat = jnp.asarray(idx_d.reshape(-1))
    w4_flat = jnp.asarray(w4_d.reshape(-1, 4))

    def variant_B(src):  # 2x packed (row-shifted), slice (2D, 2)
        s, d_pad = to_dn(src)
        packed = jnp.concatenate([s, jnp.roll(s, -row_stride, axis=1)], axis=0)
        packed = jnp.concatenate(
            [packed, jnp.zeros((packed.shape[0], 2), packed.dtype)], axis=1
        )
        g = pair_gather(packed, idx_flat, 2 * d_pad)  # (2D, M, 2)
        g = g.reshape(2, d_pad, n_out, K, 2)
        # corner order: r=[top,bottom] (packed block) x q=[left,right] (slice)
        wq = w4_flat.reshape(n_out, K, 2, 2).astype(src.dtype)
        out = jnp.einsum("rdnkq,nkrq->dn", g, wq)
        b, _, c = src.shape
        return out[: b * c].reshape(b, c, n_out).transpose(0, 2, 1)

    def variant_C(src):  # no packing, 2 gathers of slice (D, 2)
        s, d_pad = to_dn(src)
        s = jnp.concatenate(
            [s, jnp.zeros((d_pad, row_stride + 2), s.dtype)], axis=1
        )
        g_top = pair_gather(s, idx_flat, d_pad).reshape(d_pad, n_out, K, 2)
        g_bot = pair_gather(s, idx_flat + row_stride, d_pad).reshape(d_pad, n_out, K, 2)
        wq = w4_flat.reshape(n_out, K, 2, 2).astype(src.dtype)
        out = jnp.einsum("dnkq,nkq->dn", g_top, wq[:, :, 0]) + jnp.einsum(
            "dnkq,nkq->dn", g_bot, wq[:, :, 1]
        )
        b, _, c = src.shape
        return out[: b * c].reshape(b, c, n_out).transpose(0, 2, 1)

    # NOTE (2026-08-17, TPU v5e measurement): variants B and C (slice-PAIR
    # gathers, slice_sizes=(R, 2)) are DISPROVEN on TPU — the gather lowers
    # to a custom-call whose output is tiled T(8,128), so the minor slice
    # dim of 2 pads to 128 (64x memory: a 4.3 GB logical result asked for a
    # 256 GB allocation and OOM'd at compile).  Width-1 column gathers with
    # corners packed on the LEADING axis (production layout) are the only
    # layout the TPU gather executes without tiling waste.  Keep --slice_pair
    # to reproduce the negative result.
    variants = {"A_capped": variant_A, "Ap_dense": variant_Ap}
    if args.slice_pair:
        variants.update({"B_pack2": variant_B, "C_nopack": variant_C})

    # correctness cross-check on a small batch (f32)
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.random((2, n_in, C), dtype=np.float32))
    ref = np.asarray(jax.jit(variant_A)(small), np.float64)
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(small), np.float64)
        err = np.abs(got - ref).max()
        print(f"check {name:10s} max|delta| = {err:.3e}")
        assert err < 1e-4, (name, err)

    def bench(name, body, shape, dtype):
        @jax.jit
        def run(seed):
            x = (jnp.full(shape, 0.5, jnp.float32) * seed).astype(dtype)

            def step(s, _):
                v = body(s).astype(jnp.float32).sum()
                return (x.astype(jnp.float32) * (1.0 + 1e-12 * v)).astype(dtype), v

            _, vals = jax.lax.scan(step, x, None, length=args.reps)
            return vals.sum()

        float(run(jnp.float32(1.0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(1.001)))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:28s} {dt * 1000:8.2f} ms/call  (B={B})", flush=True)

    for dt_name in args.dtypes.split(","):
        dtype = DT[dt_name]
        print(f"\n-- merge variants, dtype={dt_name}, D={B * C} --")
        for name, fn in variants.items():
            bench(f"{name}/{dt_name}", fn, (B, n_in, C), dtype)

    if args.also_e2p:
        e2p = build_equi2pers_grids(spec)
        eidx = jnp.asarray(np.asarray(e2p.idx).reshape(-1))
        ew4 = jnp.asarray(np.asarray(e2p.w4).reshape(-1, 4))
        n_e = eidx.shape[0]
        erp_n = h * w

        def e2p_current(src):
            return quad_gather_blend(src, e2p.idx, e2p.w4, w)

        def e2p_nopack(src):
            s, d_pad = to_dn(src)
            s = jnp.concatenate([s, jnp.zeros((d_pad, w + 2), s.dtype)], axis=1)
            g_top = pair_gather(s, eidx, d_pad).reshape(d_pad, n_e, 2)
            g_bot = pair_gather(s, eidx + w, d_pad).reshape(d_pad, n_e, 2)
            wq = ew4.reshape(n_e, 2, 2).astype(src.dtype)
            out = jnp.einsum("dnq,nq->dn", g_top, wq[:, 0]) + jnp.einsum(
                "dnq,nq->dn", g_bot, wq[:, 1]
            )
            b, _, c = src.shape
            return out[: b * c].reshape(b, c, n_e).transpose(0, 2, 1)

        small_e = jnp.asarray(rng.random((2, erp_n, 3), dtype=np.float32))
        ref_e = np.asarray(jax.jit(e2p_current)(small_e), np.float64)
        if args.slice_pair:
            got_e = np.asarray(jax.jit(e2p_nopack)(small_e), np.float64)
            print(f"check e2p_nopack max|delta| = {np.abs(got_e - ref_e).max():.3e}")
        for dt_name in args.dtypes.split(","):
            dtype = DT[dt_name]
            print(f"\n-- equi2pers variants, dtype={dt_name}, D={B * 3} --")
            bench(f"e2p_current/{dt_name}", e2p_current, (B, erp_n, 3), dtype)
            if args.slice_pair:
                bench(f"e2p_nopack/{dt_name}", e2p_nopack, (B, erp_n, 3), dtype)


if __name__ == "__main__":
    main()
