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
orchestrator therefore gates every measurement attempt behind a cheap
~30s canary subprocess (tiny jit + device scalar) looped until the tunnel
answers, then runs the measurement in a SUBPROCESS with a per-attempt
timeout, returning to the canary loop on failure, while the total budget
(BENCH_TIMEOUT_SECS, default 900s) lasts; only if every attempt fails does
it emit an honest 0.0 line.  A host-keyed persistent compile cache
(.jax_cache/host-*, untracked) makes warm attempts compile in seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REFERENCE_PANOS_PER_SEC = 10.0  # documented estimate, see module docstring
# Wide batch*channel keeps the TPU gather on its vectorized fast path, and
# the per-INDEX gather cost (the projections' true floor, PERF_NOTES
# round-4 close-out) amortizes with row width, so throughput climbs with
# batch until ~b=256: the 2026-08-19 on-chip sweep measured (panos/s)
# b=64 -> 574.7, 128 -> 587.4, 192 -> 625.3, 256 -> 637.5, 320 -> 627.1
# (non-multiples of 64 dip on lane padding: 96 -> 541.9, 160 -> 566.5).
# BENCH_BATCH overrides for sweeps without code edits.
BATCH = int(os.environ.get("BENCH_BATCH", "256"))
ITERS = 4


CACHE_BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

# Last-good on-chip record, persisted after EVERY successful run so the
# outage fallback can never rot (VERDICT r4: the round-3 hardcoded 535.42
# understated round 4's own committed record by 16%).  Tracked in git.
LAST_GOOD_PATH = os.environ.get(
    "BENCH_LAST_GOOD_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST_GOOD.json"),
)


def _save_last_good(record: dict):
    rec = dict(record)
    rec["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        rec["commit"] = (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        rec["commit"] = "unknown"
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    except OSError as e:
        print(f"# could not persist last-good record: {e}", file=sys.stderr)


def _last_good_note() -> str:
    try:
        with open(LAST_GOOD_PATH) as f:
            rec = json.load(f)
        return (
            f"last successful on-chip record: {rec['value']} {rec['unit']} "
            f"(batch {rec.get('batch', '?')}, {rec.get('timestamp', '?')}, "
            f"commit {rec.get('commit', '?')})"
        )
    except Exception:
        return "no last-good record on file"


def canary():
    """Cheap tunnel-health probe: jit a tiny matmul on the default platform
    and materialize a device-computed scalar.  Exits 0 iff the device is
    reachable and executing; the caller bounds it with a short timeout
    (the tunnel's failure mode is a silent hang, not a fast error)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.asarray(np.random.default_rng(int(time.time()) % 2**31).random((128, 128), np.float32))
    v = float(jax.jit(lambda x: (x @ x).sum())(a))
    assert np.isfinite(v)
    print(f"canary ok: {jax.default_backend()} {v:.3f}", flush=True)


# written by worker() after its compile; per-impl AND per-batch so a
# measurement can't inherit another config's warm signal (different
# executables)
WARM_MARKER = (
    f"bench_headline.{os.environ.get('BENCH_KERNEL_IMPL', 'xla')}"
    f".{os.environ.get('BENCH_RESIZE_IMPL', 'conv')}.b{BATCH}.warm"
)


def worker():
    from omnifusion_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache(CACHE_BASE)
    import jax

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
        # the headline graph is now in this host's persistent cache; mark it
        # so the orchestrator's warm/cold budgeting keys on THIS graph, not
        # on whatever other tool happened to populate the shared cache dir
        with open(os.path.join(cache_dir, WARM_MARKER), "w") as f:
            f.write(f"{time.time():.0f}\n")
        t0 = time.perf_counter()
        float(run(variables, x0, jnp.float32(1.001)))
        return BATCH * ITERS / (time.perf_counter() - t0)

    # headline = bf16 trunk + f16 merge, the TPU-native inference recipe:
    # f32 params, f32 BN statistics and softmax; trunk matmuls/convs and the
    # equi2pers gather run bf16; the confidence-merge gather runs FLOAT16
    # (normalization still f32).  A 16-bit merge was promoted in round 3
    # after quantifying it in eval-metric terms (tools/eval_merge_dtype.py):
    # f16 times identically to bf16 on the TPU gather (53.4 ms both,
    # tools/bench_merge_variants.py — it is memory-bound) but its 10-bit
    # mantissa costs only delta abs_rel ~4e-6 vs f32 (bf16: ~3e-4), well
    # inside the 1e-3 parity bar, for +10.5% end-to-end throughput.
    # (The f32 measurement lives in PERF_NOTES via tools/bench_components.py;
    # one model here keeps a cold-compile attempt inside the retry budget.)
    # BENCH_KERNEL_IMPL lets the queue/operator measure the pallas-projection
    # composition through the same harness; the checked-in default is the
    # config the committed on-chip record says is fastest AND green.
    # BENCH_RESIZE_IMPL: the decoder 2x-upsample formulation.  Default
    # "conv" (the model default) — the separable depthwise lhs-dilated conv
    # beat the XLA dot_general lowering on chip in both phases (fwd b=256:
    # 383.7 vs 400.9 ms, measurements.log 2026-08-20 06:05).
    impl = os.environ.get("BENCH_KERNEL_IMPL", "xla")
    resize = os.environ.get("BENCH_RESIZE_IMPL", "conv")
    bf16 = measure(
        SphericalFusion(
            spec=spec, dtype=jnp.bfloat16, merge_dtype=jnp.float16,
            kernel_impl=impl, resize_impl=resize,
        )
    )
    impl_tag = "" if impl == "xla" else f", {impl} projections"
    print(
        json.dumps(
            {
                "metric": "panoramas/sec/chip (512x1024 ERP, fov 80, nrows 4, "
                f"one-shot, batch {BATCH}, bf16 trunk + f16 merge, "
                f"{resize} resize{impl_tag})",
                "value": round(bf16, 2),
                "unit": "panoramas/sec",
                "vs_baseline": round(bf16 / REFERENCE_PANOS_PER_SEC, 2),
                "batch": BATCH,
                "kernel_impl": impl,
                "resize_impl": resize,
            }
        ),
        flush=True,
    )


def _run(argv, timeout):
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), argv],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        return None, "", f"timed out after {timeout:.0f}s"


def main():
    """Canary-gated retry loop (round-3 schedule).

    The tunnel's failure mode is a silent HANG, so a full attempt launched
    blind can burn most of the budget.  Gate every full attempt behind a
    ~30s canary probe: loop the canary with short sleeps until it passes
    (each failure costs ~40s, leaving ~15+ probe windows in a 900s budget),
    and only then spend a real attempt (240s warm; one cold-compile attempt
    of up to ~500s is allowed while budget lasts).  On attempt failure,
    return to the canary loop.  Honest 0.0 only when the budget ends.
    """
    from omnifusion_tpu.utils.compile_cache import host_cache_dir

    def cache_is_warm():
        # the worker drops WARM_MARKER right after ITS graph compiles, so
        # the warm/cold signal is specific to the headline executable — a
        # >10 MB entry written by some other tool sharing the cache dir must
        # not shrink a cold compile's budget (self-correcting: a killed cold
        # compile never reaches the marker, so the next attempt stays cold)
        return os.path.exists(os.path.join(host_cache_dir(CACHE_BASE), WARM_MARKER))

    budget = float(os.environ.get("BENCH_TIMEOUT_SECS", "900"))
    deadline = time.time() + budget
    attempt = 0
    canary_fails = 0
    last_err = "no attempt ran"
    while True:
        remaining = deadline - time.time()
        if remaining < 45:
            break
        # --- canary gate ---
        rc, out, err = _run("--canary", timeout=min(30.0, remaining - 15))
        if rc != 0:
            canary_fails += 1
            last_err = f"canary #{canary_fails} failed (rc={rc}): {err.strip()[-200:]}"
            print(f"# {last_err}; waiting for tunnel", file=sys.stderr, flush=True)
            time.sleep(min(10.0, max(0.0, deadline - time.time() - 30)))
            continue
        # --- full attempt ---
        remaining = deadline - time.time()
        cap = 240.0 if cache_is_warm() else 500.0
        per_attempt = min(remaining - 15, cap)
        if per_attempt < 60.0:
            # not enough budget left for a meaningful attempt; never run
            # past the deadline (the emitter below still owns the last word)
            break
        attempt += 1
        rc, out, err = _run("--worker", timeout=per_attempt)
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if rc == 0 and lines:
            print(lines[-1], flush=True)
            try:
                _save_last_good(json.loads(lines[-1]))
            except Exception as e:
                print(f"# could not save last-good record: {e}", file=sys.stderr)
            return
        if rc is None:
            last_err = f"attempt {attempt} {err}"
            # a timed-out "warm" attempt usually means the marker is stale
            # (code changed since it was written -> new cache key -> cold
            # compile under the warm cap); drop it so the retry budgets cold
            try:
                os.remove(os.path.join(host_cache_dir(CACHE_BASE), WARM_MARKER))
            except OSError:
                pass
        else:
            last_err = f"attempt {attempt} rc={rc}: {err.strip()[-300:]}"
            if rc < 0:
                # killed by a signal: a corrupt cache entry (the cache dir is
                # host-keyed, so foreign-host AOT poisoning should no longer
                # happen — defense in depth).  Purge OUR host's subdir only;
                # cache_is_warm() then grants the repair attempt a cold budget.
                import shutil

                shutil.rmtree(host_cache_dir(CACHE_BASE), ignore_errors=True)
        print(f"# {last_err}; retrying", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "panoramas/sec/chip (512x1024 ERP, fov 80, nrows 4, "
                "one-shot, bf16 trunk + f16 merge) — TPU UNREACHABLE, all attempts failed",
                "value": 0.0,
                "unit": "panoramas/sec",
                "vs_baseline": 0.0,
                "note": f"tunnel down for the whole {budget:.0f}s budget "
                f"({canary_fails} canary probes failed, {attempt} full attempts); "
                + _last_good_note(),
            }
        ),
        flush=True,
    )
    print(f"# last error: {last_err}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    elif "--canary" in sys.argv:
        canary()
    else:
        main()
