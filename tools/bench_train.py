"""Time one flagship TRAINING step on the real TPU and report MFU.

Canonical train config (reference train_erp_depth.py:40-48): batch 8,
512x1024 ERP, fov 80, nrows 4, patch 128, BerHu, AdamW.  Also times the
inference forward and derives MFU from XLA's own cost analysis against the
measured 19.7 TFLOP/s bf16 MXU peak (PERF_NOTES.md machine calibration).

Timing rules for this runtime (PERF_NOTES.md): distinct inputs per call and
materialize a device scalar per call.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Measured 16384^3 bf16 matmul, 8 reps chained in one jit with a FULL data
# dependency (each product feeds the next matmul — a partial dependency like
# c[0,0] lets XLA dead-code the matmul body and reads absurd rates).  85% of
# the chip's 197 TFLOP/s theoretical peak.  Round 1 recorded 19.7 here; that
# measurement was dispatch-bound and under-read the MXU by 8.5x.
PEAK_TFLOPS = 168.0


def timed(run, seed0=1.0, seed1=1.001, iters=1):
    """Time one chained-jit dispatch (see bench.py: iterations must be
    chained inside ONE jit with a data dependency — this runtime elides
    repeated identical dispatches, and warm-up/timed calls must differ)."""
    float(run(seed0))  # compile + warm-up
    t0 = time.perf_counter()
    float(run(seed1))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--merge_dtype", choices=["f32", "bf16", "f16"], default="f32")
    ap.add_argument("--kernel_impl", choices=["xla", "pallas", "pallas_full"], default="xla")
    args = ap.parse_args()

    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()

    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.training import create_train_state, make_optimizer, make_train_step

    print(f"devices: {jax.devices()}", flush=True)
    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), nrows=4)
    model = SphericalFusion(
        spec=spec,
        dtype=jnp.bfloat16 if args.bf16 else None,
        merge_dtype={"f32": None, "bf16": jnp.bfloat16, "f16": jnp.float16}[args.merge_dtype],
        kernel_impl=args.kernel_impl,
    )

    rng = np.random.default_rng(0)
    b = args.batch

    def batch_of(i):
        r = np.random.default_rng(i)
        return {
            "rgb": jnp.asarray(r.random((b, 512, 1024, 3), dtype=np.float32)),
            "depth": jnp.asarray((r.random((b, 512, 1024, 1)) * 7 + 0.3).astype(np.float32)),
            "mask": jnp.ones((b, 512, 1024, 1), jnp.float32),
        }

    tx = make_optimizer(lr=1e-4)
    rgb1 = jnp.zeros((1, 512, 1024, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), rgb1, tx)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    # ---- inference forward ----
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, jnp.zeros((b, 512, 1024, 3), jnp.float32)
    )
    cost = lowered.compile().cost_analysis()
    fwd_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    x0 = batch_of(0)["rgb"]

    # inputs ride as jit ARGUMENTS: closed-over arrays are baked into the
    # HLO as constants, which blows the tunnel's compile-payload limit
    @jax.jit
    def run_fwd(seed, x):
        def step_fn(s, _):
            out = model.apply(variables, s, train=False).sum()
            return x * (seed + 1e-12 * out), out

        _, outs = jax.lax.scan(step_fn, x * seed, None, length=args.iters)
        return outs.sum()

    t_fwd = timed(lambda seed: run_fwd(seed, x0), iters=args.iters)
    fwd_mfu = fwd_flops / t_fwd / (PEAK_TFLOPS * 1e12)
    print(
        f"forward  b={b}: {t_fwd*1e3:8.1f} ms  {b/t_fwd:7.1f} panos/s  "
        f"{fwd_flops/1e9:.1f} GFLOP  MFU {fwd_mfu*100:.1f}%",
        flush=True,
    )

    # ---- train step ----
    step = make_train_step(model, donate=False)
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[batch_of(100 + i) for i in range(args.iters)]
    )
    lowered_t = step.lower(state, batch_of(100))
    cost_t = lowered_t.compile().cost_analysis()
    t_flops = float(cost_t.get("flops", 0.0)) if cost_t else 0.0

    @jax.jit
    def run_train(seed, st0, bs):
        def step_fn(st, bb):
            bb = dict(bb, rgb=bb["rgb"] * seed)
            st, metrics = step(st, bb)
            return st, metrics["loss"]

        # threading the train state through the scan is the data dependency
        _, losses = jax.lax.scan(step_fn, st0, bs)
        return losses.sum()

    t_step = timed(lambda seed: run_train(seed, state, batches), iters=args.iters)
    t_mfu = t_flops / t_step / (PEAK_TFLOPS * 1e12)
    print(
        f"train    b={b}: {t_step*1e3:8.1f} ms  {b/t_step:7.1f} panos/s  "
        f"{t_flops/1e9:.1f} GFLOP  MFU {t_mfu*100:.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
