"""Time the decoder's 2x upsample: XLA dot_general path vs the Pallas stencil.

Shapes = the five flagship decoder stages at a given batch (patch 128).

    python tools/bench_resize.py --batch 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()

    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()
    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.models.layers import resize_bilinear

    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    bp = args.batch * 18  # flagship patch count
    # (h, w, c) per decoder stage at patch 128
    stages = [(4, 4, 512), (8, 8, 256), (16, 16, 128), (32, 32, 64), (64, 64, 32)]

    def bench(name, impl):
        @jax.jit
        def run(seed):
            def body(s, _):
                v = 0.0
                for h, w, c in stages:
                    # positional content (not a broadcast constant, which the
                    # algebraic simplifier could fold through the linear resize)
                    x = (
                        jax.lax.broadcasted_iota(jnp.float32, (bp, h, w, c), 1) * s
                        + jax.lax.broadcasted_iota(jnp.float32, (bp, h, w, c), 3)
                    ).astype(dt)
                    v += resize_bilinear(x, (2 * h, 2 * w), impl=impl).astype(jnp.float32).sum()
                return s * (1.0 + 1e-12 * v), v

            _, vals = jax.lax.scan(body, seed, None, length=args.reps)
            return vals.sum()

        float(run(jnp.float32(1.0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(1.001)))
        dt_s = (time.perf_counter() - t0) / args.reps
        print(f"{name:16s} {dt_s*1000:8.2f} ms for all 5 stages (bp={bp})", flush=True)

    bench(f"xla/{args.dtype}", "xla")
    bench(f"pallas/{args.dtype}", "pallas")


if __name__ == "__main__":
    main()
