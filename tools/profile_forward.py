"""Op-level profile of the flagship forward (VERDICT round-2 #4 follow-up).

Captures an xprof trace of a few warm b=64 forwards, then aggregates the
device-side op events from the trace JSON into a table grouped by HLO op
category, attributing each to a pipeline stage (equi2pers / merge / trunk)
by HLO name heuristics.  This is the measurement tool behind the
"non-MXU tax" numbers in PERF_NOTES.md.

    python tools/profile_forward.py --batch 64 --bf16 --merge_dtype f16
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import tempfile


def parse_trace(profile_dir: str):
    """Aggregate device-lane op durations from the newest trace.json.gz.

    Returns (per_op, per_src, total_ms, path): per_op keys are HLO op names,
    per_src keys are the op's top `source` frame (repo file:line), each
    mapping to [ms, bytes_accessed, example_long_name]."""
    paths = sorted(
        glob.glob(os.path.join(profile_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise SystemExit(f"no trace under {profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: pid whose process_name mentions TPU/device XLA op streams
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = {
        p
        for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Device" in n
    }
    per_op = collections.defaultdict(lambda: [0.0, 0, ""])
    per_src = collections.defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        # XLA op lanes carry individual HLO ops; skip step/module summary lanes
        if "XLA Modules" in tname or "Steps" in tname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        nbytes = int(args.get("bytes_accessed", 0))
        long_name = args.get("long_name", "")
        src = args.get("source", "?").replace("/root/repo/omnifusion_tpu/", "")
        for agg, key in ((per_op, e["name"]), (per_src, src)):
            agg[key][0] += dur
            agg[key][1] += nbytes
            if dur > 1.0 and not agg[key][2]:
                agg[key][2] = long_name
        total += dur
    return per_op, per_src, total, paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--merge_dtype", choices=["f32", "bf16", "f16"], default="f32")
    ap.add_argument("--kernel_impl", choices=["xla", "pallas", "pallas_full"], default="xla")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument(
        "--train",
        action="store_true",
        help="profile a full train step (forward+backward+update) instead "
        "of the inference forward — the VERDICT-r3 #8 re-profile",
    )
    ap.add_argument(
        "--parse_only", default=None, help="skip running; parse this profile dir"
    )
    args = ap.parse_args()

    if args.parse_only:
        prof_dir = args.parse_only
    else:
        import numpy as np

        from omnifusion_tpu.cli.common import apply_runtime_env

        apply_runtime_env()
        import jax
        import jax.numpy as jnp

        from omnifusion_tpu.models import SphericalFusion
        from omnifusion_tpu.projection import ProjectionSpec

        spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), 4)
        cdt = jnp.bfloat16 if args.bf16 else None
        mdt = {"f32": None, "bf16": jnp.bfloat16, "f16": jnp.float16}[args.merge_dtype]
        model = SphericalFusion(spec=spec, dtype=cdt, merge_dtype=mdt, kernel_impl=args.kernel_impl)
        rgb1 = jnp.zeros((1, 512, 1024, 3), jnp.float32)

        rng = np.random.default_rng(0)
        if args.train:
            from omnifusion_tpu.training import (
                create_train_state,
                make_optimizer,
                make_train_step,
            )

            state = create_train_state(
                model, jax.random.PRNGKey(0), rgb1, make_optimizer(lr=1e-4)
            )
            step = make_train_step(model, donate=False)
            batches = [
                {
                    "rgb": jnp.asarray(rng.random((args.batch, 512, 1024, 3), dtype=np.float32)),
                    "depth": jnp.asarray((rng.random((args.batch, 512, 1024, 1)) * 7 + 0.3).astype(np.float32)),
                    "mask": jnp.ones((args.batch, 512, 1024, 1), jnp.float32),
                }
                for _ in range(args.reps)
            ]
            state, m = step(state, batches[0])  # compile + warm
            float(m["loss"])
            prof_dir = args.profile_dir or tempfile.mkdtemp(prefix="of_prof_")
            with jax.profiler.trace(prof_dir):
                v = 0.0
                for b in batches:
                    state, m = step(state, b)
                    v += float(m["loss"])
            print(f"trace in {prof_dir} (loss checksum {v:.3f})")
        else:
            variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), rgb1))()

            @jax.jit
            def fwd(x):
                return model.apply(variables, x, train=False).sum()

            xs = [
                jnp.asarray(rng.random((args.batch, 512, 1024, 3), dtype=np.float32))
                for _ in range(args.reps)
            ]
            float(fwd(xs[0]))  # compile + warm
            prof_dir = args.profile_dir or tempfile.mkdtemp(prefix="of_prof_")
            with jax.profiler.trace(prof_dir):
                v = 0.0
                for x in xs:
                    v += float(fwd(x))
            print(f"trace in {prof_dir} (checksum {v:.3f})")

    per_op, per_src, total, path = parse_trace(prof_dir)
    # --reps must match the original capture when re-parsing with --parse_only
    reps = args.reps
    print(f"parsed {path}")
    print(f"total device op time: {total:.2f} ms ({total / reps:.2f} ms/rep)\n")
    print(f"== by source line ==\n{'source':48s} {'ms/rep':>9s}  {'%':>5s}  {'GB/s':>7s}")
    for src, (ms, nb, _) in sorted(per_src.items(), key=lambda kv: -kv[1][0])[: args.top]:
        bw = nb / 1e9 / (ms / 1e3) if ms else 0.0
        print(f"{src[:48]:48s} {ms / reps:9.3f}  {100 * ms / total:5.1f}  {bw:7.0f}")
    print(f"\n== by op ==\n{'op':28s} {'ms/rep':>9s}  {'%':>5s}  long_name")
    for name, (ms, nb, ln) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{name[:28]:28s} {ms / reps:9.3f}  {100 * ms / total:5.1f}  {ln[:90]}")


if __name__ == "__main__":
    main()
