"""Throughput sweep for the flagship one-shot model on a single chip.

Sweeps batch size and precision mode (f32 / bf16 trunk / 16-bit merges)
to locate the panos/sec sweet spot; honest axon timing per PERF_NOTES.md.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_sweep.py --batches 32,64,96
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
    ap.add_argument("--batches", default="32,64,96")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--modes", default="bf16,f16_merge")
    ap.add_argument(
        "--kernel_impl",
        choices=["xla", "pallas", "pallas_full"],
        default="xla",
        help="projection blend implementation (see SphericalFusion.kernel_impl)",
    )
    ap.add_argument(
        "--model",
        default="oneshot",
        choices=("oneshot", "iterative"),
        help="iterative = the reference's canonical eval protocol (iter 2)",
    )
    args = ap.parse_args()

    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()

    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.models import SphericalFusion, SphericalFusionIterative
    from omnifusion_tpu.projection import ProjectionSpec

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), 4)
    rgb1 = jnp.zeros((1, 512, 1024, 3), jnp.float32)

    if args.model == "iterative":
        def make(**kw):
            m = SphericalFusionIterative(
                spec=spec, num_iters=2, kernel_impl=args.kernel_impl, **kw
            )
            return m, (lambda v, x: m.apply(v, x, train=False)[-1])
    else:
        def make(**kw):
            m = SphericalFusion(spec=spec, kernel_impl=args.kernel_impl, **kw)
            return m, (lambda v, x: m.apply(v, x, train=False))

    m0, _ = make()
    variables = jax.jit(lambda: m0.init(jax.random.PRNGKey(0), rgb1))()

    models = {
        "f32": make(),
        "bf16": make(dtype=jnp.bfloat16),
        "bf16_merge": make(dtype=jnp.bfloat16, merge_dtype=jnp.bfloat16),
        # the promoted headline recipe (f16 merge, PERF_NOTES round 3)
        "f16_merge": make(dtype=jnp.bfloat16, merge_dtype=jnp.float16),
    }

    for b in (int(x) for x in args.batches.split(",")):
        x0 = jnp.asarray(
            np.random.default_rng(0).random((b, 512, 1024, 3), dtype=np.float32)
        )
        for mode in args.modes.split(","):
            _, apply = models[mode]

            # chain the timed forwards inside ONE jit with a data dependency
            # (same protocol as bench.py): the runtime elides repeated
            # identical dispatches, so a plain python loop over pre-built
            # inputs replays the warm-up dispatch for free and inflates
            # throughput ~iters/(iters-1)
            @jax.jit
            def run(v, x, seed, _apply=apply):
                def step(s, _):
                    out = _apply(v, s).sum()
                    return x * (seed + 1e-12 * out), out

                _, outs = jax.lax.scan(step, x * seed, None, length=args.iters)
                return outs.sum()

            float(run(variables, x0, jnp.float32(1.0)))  # compile + warm-up
            t0 = time.perf_counter()
            float(run(variables, x0, jnp.float32(1.001)))
            dt = (time.perf_counter() - t0) / args.iters
            print(
                f"b={b:3d} {mode:10s} {dt*1e3:8.2f} ms  {b/dt:8.1f} panos/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
