"""Benchmark: panoramas/sec/chip for flagship one-shot inference.

Canonical config (BASELINE.json / README.md:58-66 of the reference):
512x1024 ERP, fov 80, nrows 4 (18 tangent patches), one-shot spherical
fusion.  Prints ONE JSON line.

vs_baseline: the reference repo publishes no throughput (SURVEY.md §6;
thop imported but never called, test.py:32).  The baseline constant below
is a documented engineering estimate of the torch reference on its target
GPU (V100-class): ~40 GFLOP forward at achievable ~4 TFLOP/s utilization
plus its per-call CPU grid rebuild => ~10 panoramas/sec.  BASELINE.json's
north star of >=10x per-chip throughput corresponds to vs_baseline >= 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PANOS_PER_SEC = 10.0  # documented estimate, see module docstring
BATCH = 64  # the TPU gather fast path needs a wide batch*channel dim
ITERS = 4


def _timeout_guard():
    """The TPU tunnel in this environment occasionally goes down hard (jit
    dispatch hangs forever).  Emit an honest failure line instead of hanging."""
    import os
    import threading

    def expire():
        # a thread (not SIGALRM): the hang sits inside a blocking C call that
        # never returns to the interpreter, so signal handlers don't run
        print(
            json.dumps(
                {
                    "metric": "panoramas/sec/chip (512x1024 ERP, fov 80, nrows 4, one-shot) — TPU UNREACHABLE, benchmark timed out",
                    "value": 0.0,
                    "unit": "panoramas/sec",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(2)

    timer = threading.Timer(float(os.environ.get("BENCH_TIMEOUT_SECS", "900")), expire)
    timer.daemon = True
    timer.start()


def main():
    _timeout_guard()
    import jax
    import jax.numpy as jnp
    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.projection import ProjectionSpec

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), nrows=4)
    model = SphericalFusion(spec=spec)
    rgb1 = jnp.zeros((1, 512, 1024, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), rgb1))()

    # Honest timing on this runtime requires BOTH: distinct inputs per call
    # (identical dispatches get elided) AND materializing a device-computed
    # scalar (block_until_ready can return before execution completes) —
    # see PERF_NOTES.md.
    inputs = [
        jnp.asarray(
            np.random.default_rng(i).random((BATCH, 512, 1024, 3), dtype=np.float32)
        )
        for i in range(ITERS)
    ]
    fwd_sum = jax.jit(lambda v, x: model.apply(v, x, train=False).sum())
    float(fwd_sum(variables, inputs[0]))  # compile + warm-up

    t0 = time.perf_counter()
    for i in range(ITERS):
        float(fwd_sum(variables, inputs[i]))
    dt = time.perf_counter() - t0

    panos_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "panoramas/sec/chip (512x1024 ERP, fov 80, nrows 4, one-shot)",
                "value": round(panos_per_sec, 2),
                "unit": "panoramas/sec",
                "vs_baseline": round(panos_per_sec / REFERENCE_PANOS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
