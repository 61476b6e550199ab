"""Pallas vs XLA merge-blend shootout at flagship shapes (round-3 #4).

    python tools/bench_pallas_merge.py --batch 64 --dtypes f16,bf16,f32
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--only",
        default="all",
        choices=["all", "merge_pallas", "merge", "e2p"],
        help="restrict which variants are timed (smaller graphs compile "
        "inside short tunnel-up windows; correctness checks always run)",
    )
    ap.add_argument("--dtypes", default="f16")
    ap.add_argument("--blk", type=int, default=256)
    args = ap.parse_args()

    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()
    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas
    from omnifusion_tpu.ops.sparse_blend import capped_quad_gather_blend
    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.projection.spec import build_pers2equi_grids

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), 4)
    p2e = build_pers2equi_grids(spec)
    ic, wc, tp, ti, tw = p2e.capped
    n_in = spec.n_patches * spec.patch_h * spec.patch_w
    B, C = args.batch, args.channels
    DT = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}

    # tiny pallas probe first: fail fast if Mosaic doesn't lower on this chip
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    probe = pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:] * 2.0),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.ones((256, 128), jnp.float32))
    assert float(probe.sum()) == 2.0 * 256 * 128
    print(f"pallas probe ok on {jax.default_backend()}", flush=True)

    def xla_path(src):
        return capped_quad_gather_blend(src, ic, wc, tp, ti, tw, spec.patch_w, channel_first=True)

    def pallas_path(src):
        return quad_gather_blend_pallas(src, ic, wc, tp, ti, tw, spec.patch_w, blk=args.blk)

    # correctness cross-check at full shape (f32, small batch via lane pad)
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.random((64, 2, n_in), dtype=np.float32))
    ref = jax.jit(xla_path)(small)
    got = jax.jit(pallas_path)(small)
    err = float(jnp.abs(got - ref).max())
    print(f"check max|delta| = {err:.3e}", flush=True)
    assert err < 1e-4, err

    def bench(name, body, dtype, shape):
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
        print(f"{name:24s} {dt * 1000:8.2f} ms/call  (B={B})", flush=True)

    for dt_name in args.dtypes.split(","):
        print(f"\n-- dtype={dt_name}, D={B * C} --")
        if args.only in ("all", "merge"):
            bench(f"xla_capped/{dt_name}", xla_path, DT[dt_name], (B, C, n_in))
        if args.only in ("all", "merge", "merge_pallas"):
            bench(f"pallas/{dt_name}", pallas_path, DT[dt_name], (B, C, n_in))

    # equi2pers direction (channel-last, K=1)
    from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas_cl
    from omnifusion_tpu.ops.sparse_blend import quad_gather_blend
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    e2p = build_equi2pers_grids(spec)
    n_erp = spec.erp_h * spec.erp_w

    def e2p_xla(src):
        return quad_gather_blend(src, e2p.idx, e2p.w4, spec.erp_w)

    def e2p_pallas(src):
        return quad_gather_blend_pallas_cl(src, e2p.idx, e2p.w4, spec.erp_w)

    small_e = jnp.asarray(rng.random((64, n_erp, 3), dtype=np.float32))
    err_e = float(jnp.abs(jax.jit(e2p_pallas)(small_e) - jax.jit(e2p_xla)(small_e)).max())
    print(f"\ncheck e2p max|delta| = {err_e:.3e}", flush=True)
    assert err_e < 1e-4, err_e

    for dt_name in args.dtypes.split(","):
        if args.only not in ("all", "e2p"):
            continue
        print(f"\n-- e2p variants, dtype={dt_name}, D={B * 3} --")
        bench(f"e2p_xla/{dt_name}", e2p_xla, DT[dt_name], (B, n_erp, 3))
        bench(f"e2p_pallas/{dt_name}", e2p_pallas, DT[dt_name], (B, n_erp, 3))


if __name__ == "__main__":
    main()
