"""Per-component benchmark with honest axon-runtime timing.

Measures trunk / equi2pers / merge / full forward at configurable batch,
forcing real execution by materializing device-computed scalars (see
PERF_NOTES.md for why block_until_ready alone is insufficient).

    python tools/bench_components.py --batch 64
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
    ap.add_argument("--erp_size", default="512,1024")
    ap.add_argument("--patchsize", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--bf16", action="store_true", help="bf16 trunk + projections")
    ap.add_argument(
        "--merge_dtype",
        choices=["f32", "bf16", "f16"],
        default="f32",
        help="precision of the confidence-merge gather",
    )
    ap.add_argument(
        "--kernel_impl",
        choices=["xla", "pallas", "pallas_full"],
        default="xla",
        help="projection blend implementation (see SphericalFusion.kernel_impl)",
    )
    ap.add_argument(
        "--only",
        default="all",
        help="comma list of components to time (e2p,merge,trunk,full) — the "
        "round-3 queue showed one process timing all four can outlive a "
        "600 s tunnel-window budget on cold compiles; split entries fit",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only != "all" else {"e2p", "merge", "trunk", "full"}

    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()

    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.models.spherical_fusion import DepthTrunk, confidence_merge
    from omnifusion_tpu.projection import (
        ProjectionSpec,
        build_equi2pers_grids,
        build_pers2equi_grids,
        equi2pers,
    )

    h, w = (int(x) for x in args.erp_size.split(","))
    B = args.batch
    spec = ProjectionSpec.create((h, w), (args.patchsize, args.patchsize), (80, 80), 4)
    g_hr = build_equi2pers_grids(spec)
    p2e = build_pers2equi_grids(spec)
    P = spec.n_patches
    ph = spec.patch_h

    def bench(name, shape, body):
        @jax.jit
        def run(seed):
            x = jnp.full(shape, 0.5, jnp.float32) * seed
            def step(s, _):
                v = body(s)
                return s * (1.0 + 1e-12 * v), v
            _, vals = jax.lax.scan(step, x, None, length=args.reps)
            return vals.sum()
        float(run(jnp.float32(1.0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(1.001)))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:36s} {dt*1000:8.2f} ms/batch{B}  ({B/dt:8.1f} panos/s)")

    cdt = jnp.bfloat16 if args.bf16 else None
    mdt = {"f32": None, "bf16": jnp.bfloat16, "f16": jnp.float16}[args.merge_dtype]

    def maybe_cast(x):
        return x.astype(cdt) if cdt is not None else x

    if "e2p" in only:
        bench(
            "equi2pers full-res", (B, h, w, 3), lambda x: equi2pers(maybe_cast(x), g_hr, impl=args.kernel_impl).sum()
        )
    if "merge" in only:
        bench(
            "merge (confidence)",
            (B, P, ph, ph, 1),
            lambda x: confidence_merge(x, x * 0.5 + 0.2, p2e, dtype=mdt, impl=args.kernel_impl).sum(),
        )

    if "trunk" in only:
        trunk = DepthTrunk(dtype=cdt, kernel_impl=args.kernel_impl)
        pz = jnp.zeros((1, P, ph, ph, 3))
        pf = jnp.zeros((1, P, ph // 4, ph // 4, 64))
        tv = jax.jit(lambda: trunk.init(jax.random.PRNGKey(0), pz, pf))()
        bench(
            "trunk",
            (B, P, ph, ph, 3),
            lambda x: sum(o.sum() for o in trunk.apply(tv, x, pf, train=False)),
        )

    if "full" in only:
        model = SphericalFusion(spec=spec, dtype=cdt, merge_dtype=mdt, kernel_impl=args.kernel_impl)
        rgb1 = jnp.zeros((1, h, w, 3))
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), rgb1))()
        bench(
            "FULL forward",
            (B, h, w, 3),
            lambda x: model.apply(variables, x, train=False).sum(),
        )


if __name__ == "__main__":
    main()
