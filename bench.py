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

Resilience: the TPU tunnel in this environment goes down for stretches
(dispatch hangs inside a blocking C call — unkillable in-process).  The
orchestrator therefore runs the actual measurement in a SUBPROCESS with a
per-attempt timeout and retries with backoff while the total budget
(BENCH_TIMEOUT_SECS, default 900s) lasts; only if every attempt fails does
it emit an honest 0.0 line.  A persistent compile cache (committed
.dryrun_cache) makes warm attempts compile in seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REFERENCE_PANOS_PER_SEC = 10.0  # documented estimate, see module docstring
BATCH = 64  # the TPU gather fast path needs a wide batch*channel dim
ITERS = 4


def worker():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".dryrun_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.projection import ProjectionSpec

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), nrows=4)
    rgb1 = jnp.zeros((1, 512, 1024, 3), jnp.float32)
    variables = jax.jit(
        lambda: SphericalFusion(spec=spec).init(jax.random.PRNGKey(0), rgb1)
    )()

    # Honest timing on this runtime requires BOTH: distinct inputs per call
    # (identical dispatches get elided) AND materializing a device-computed
    # scalar (block_until_ready can return before execution completes) —
    # see PERF_NOTES.md.  ITERS forwards are chained inside ONE jit via
    # lax.scan with a data dependency (each iteration perturbs the input by
    # a function of the previous output), so the measurement is device time,
    # not ITERS x tunnel dispatch latency.
    x0 = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 512, 1024, 3), dtype=np.float32)
    )

    def measure(model):
        @jax.jit
        def run(v, x, seed):
            def step(s, _):
                out = model.apply(v, s, train=False).sum()
                return x * (seed + 1e-12 * out), out

            _, outs = jax.lax.scan(step, x * seed, None, length=ITERS)
            return outs.sum()

        float(run(variables, x0, jnp.float32(1.0)))  # compile + warm-up
        t0 = time.perf_counter()
        float(run(variables, x0, jnp.float32(1.001)))
        return BATCH * ITERS / (time.perf_counter() - t0)

    # headline = bf16 compute, the TPU-native inference dtype: f32 params,
    # f32 BN statistics and softmax, f32 confidence merge — only the trunk
    # matmuls/convs and the bandwidth-bound equi2pers gather run bf16.
    # (The f32 measurement lives in PERF_NOTES via tools/bench_components.py;
    # one model here keeps a cold-compile attempt inside the retry budget.)
    bf16 = measure(SphericalFusion(spec=spec, dtype=jnp.bfloat16))
    print(
        json.dumps(
            {
                "metric": "panoramas/sec/chip (512x1024 ERP, fov 80, nrows 4, "
                "one-shot, bf16 trunk)",
                "value": round(bf16, 2),
                "unit": "panoramas/sec",
                "vs_baseline": round(bf16 / REFERENCE_PANOS_PER_SEC, 2),
            }
        ),
        flush=True,
    )


def main():
    budget = float(os.environ.get("BENCH_TIMEOUT_SECS", "900"))
    deadline = time.time() + budget
    attempt = 0
    last_err = "no attempt ran"
    cold_retry = False
    while True:
        attempt += 1
        remaining = deadline - time.time()
        if remaining < 30:
            break
        # leave headroom so the final failure line still prints in-budget;
        # the first attempt gets enough for a healthy-but-cold compile while
        # ALWAYS reserving ~280s so a hung attempt 1 still leaves one warm
        # retry (the tunnel's failure mode is a hang, not a fast error)
        if attempt == 1 or cold_retry:
            cap = max(remaining - 280, 480.0)
            cold_retry = False
        else:
            cap = max(240.0, budget / 3)
        per_attempt = min(remaining - 15, max(cap, 60.0))
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        try:
            out, err = proc.communicate(timeout=per_attempt)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            last_err = f"attempt {attempt} timed out after {per_attempt:.0f}s"
            print(f"# {last_err}; retrying", file=sys.stderr, flush=True)
            time.sleep(min(20.0 * attempt, max(0.0, deadline - time.time() - 30)))
            continue
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1], flush=True)
            return
        last_err = f"attempt {attempt} rc={proc.returncode}: {err.strip()[-300:]}"
        if proc.returncode < 0:
            # killed by a signal: suspect a poisoned AOT cache entry (compiled
            # on a host with different CPU features -> SIGILL on load).  Purge
            # the cache so the next attempt repairs it with a fresh compile
            # (which then re-warms the cache for all later attempts/runs),
            # and grant that attempt the cold-compile budget.
            import shutil

            cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".dryrun_cache")
            shutil.rmtree(cache, ignore_errors=True)
            cold_retry = True
        print(f"# {last_err}; retrying", file=sys.stderr, flush=True)
        time.sleep(min(20.0 * attempt, max(0.0, deadline - time.time() - 30)))
    print(
        json.dumps(
            {
                "metric": "panoramas/sec/chip (512x1024 ERP, fov 80, nrows 4, "
                "one-shot, bf16 trunk) — TPU UNREACHABLE, all attempts failed",
                "value": 0.0,
                "unit": "panoramas/sec",
                "vs_baseline": 0.0,
            }
        ),
        flush=True,
    )
    print(f"# last error: {last_err}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
