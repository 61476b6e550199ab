"""Throughput sweep for the flagship one-shot model on a single chip.

Sweeps batch size and precision mode (f32 / bf16 trunk / bf16 trunk+merge)
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
    ap.add_argument("--modes", default="bf16,bf16_merge")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.projection import ProjectionSpec

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), 4)
    rgb1 = jnp.zeros((1, 512, 1024, 3), jnp.float32)
    variables = jax.jit(
        lambda: SphericalFusion(spec=spec).init(jax.random.PRNGKey(0), rgb1)
    )()

    models = {
        "f32": SphericalFusion(spec=spec),
        "bf16": SphericalFusion(spec=spec, dtype=jnp.bfloat16),
        "bf16_merge": SphericalFusion(
            spec=spec, dtype=jnp.bfloat16, merge_dtype=jnp.bfloat16
        ),
    }

    for b in (int(x) for x in args.batches.split(",")):
        xs = [
            jnp.asarray(
                np.random.default_rng(i).random((b, 512, 1024, 3), dtype=np.float32)
            )
            for i in range(args.iters)
        ]
        for mode in args.modes.split(","):
            model = models[mode]
            fwd = jax.jit(lambda v, x: model.apply(v, x, train=False).sum())
            float(fwd(variables, xs[0]))
            t0 = time.perf_counter()
            for x in xs:
                float(fwd(variables, x))
            dt = (time.perf_counter() - t0) / args.iters
            print(
                f"b={b:3d} {mode:10s} {dt*1e3:8.2f} ms  {b/dt:8.1f} panos/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
