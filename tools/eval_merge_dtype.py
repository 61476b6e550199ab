"""Quantify the bf16 merge in EVAL-METRIC terms (promote/park evidence).

The pers2equi confidence merge (reference: equi_pers/pers2equi_v3.py:171-196,
model/spherical_model.py:304-311) runs f32 in the bench headline config even
when the trunk is bf16; running it bf16 too ("bf16_merge") bought +10.5%
throughput in round 2 but was parked with only a raw depth-error figure.
Round-2 VERDICT #3: the promote/park decision needs the delta expressed in
the project's parity currency — the eval metrics (abs_rel, d1, ...).

Protocol:
  1. overfit an f32 model on synthetic panoramas at 256x512 (so predictions
     have a trained-regime error scale rather than random-init garbage);
  2. evaluate the SAME weights under
       A = bf16 trunk + f32 merge   (bench headline)
       B = bf16 trunk + bf16 merge  (candidate)
     at 256x512 and at the flagship 512x1024 spec (the param tree is
     ERP-size independent — tests/test_model.py pins this);
  3. report per-metric values and deltas, plus direct pred-vs-pred error.

The project parity bar is abs_rel <= 1e-3 (BASELINE.json).
Run on CPU (JAX_PLATFORMS=cpu, default here) or TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def batches_of(ds, batch, count=None):
    idx = list(range(len(ds)))
    out = []
    for i in range(0, len(idx), batch):
        chunk = [ds[j] for j in idx[i : i + batch]]
        if len(chunk) < batch:
            break
        rgb, depth, mask = (np.stack(x) for x in zip(*chunk))
        out.append({"rgb": rgb, "depth": depth, "mask": mask})
        if count and len(out) >= count:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train_size", type=int, default=8)
    ap.add_argument("--platform", default=None, help="cpu/tpu (default: env)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()

    import jax.numpy as jnp

    from omnifusion_tpu.data import make_dataset
    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.training import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    train_erp = (256, 512)
    spec = ProjectionSpec.create(train_erp, (128, 128), (80, 80), 4)
    model = SphericalFusion(spec=spec)
    ds = make_dataset("synthetic", size=args.train_size, pano_h=train_erp[0], pano_w=train_erp[1], seed=0)
    train_batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in batches_of(ds, args.batch)
    ]

    state = create_train_state(
        model, jax.random.PRNGKey(0), train_batches[0]["rgb"][:1], make_optimizer(lr=3e-4)
    )
    step = make_train_step(model, donate=False)
    for i in range(args.steps):
        state, metrics = step(state, train_batches[i % len(train_batches)])
        if i % 25 == 0 or i == args.steps - 1:
            print(f"train step {i}: loss {float(metrics['loss']):.4f}", flush=True)

    params, stats = state.params, state.batch_stats

    def evaluate(erp, merge_dtype):
        espec = spec if erp == train_erp else ProjectionSpec.create(erp, (128, 128), (80, 80), 4)
        emodel = SphericalFusion(spec=espec, dtype=jnp.bfloat16, merge_dtype=merge_dtype)
        estep = make_eval_step(emodel)
        eds = make_dataset("synthetic", size=4, pano_h=erp[0], pano_w=erp[1], seed=0)
        totals, total_n, preds = {}, 0.0, []
        for b in batches_of(eds, 2):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            m, n, pred = estep(params, stats, b)
            n = float(n)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v) * n
            total_n += n
            preds.append(np.asarray(pred, np.float64))
        return {k: v / total_n for k, v in totals.items()}, np.concatenate(preds)

    candidates = {"bf16_merge": jnp.bfloat16, "f16_merge": jnp.float16}
    report = {}
    for erp in (train_erp, (512, 1024)):
        a, pred_a = evaluate(erp, None)
        tag = f"{erp[0]}x{erp[1]}"
        report[tag] = {"f32_merge": a}
        print(f"\n## {tag}")
        for name, mdt in candidates.items():
            b, pred_b = evaluate(erp, mdt)
            rel = np.abs(pred_a - pred_b) / np.maximum(pred_a, 1e-3)
            report[tag][name] = b
            report[tag][f"{name}_delta"] = {k: b[k] - a[k] for k in a}
            report[tag][f"{name}_pred_rel_err"] = {
                "mean": float(rel.mean()),
                "p99": float(np.quantile(rel, 0.99)),
                "max": float(rel.max()),
            }
            print(f"| metric | f32 merge | {name} | delta |")
            print(f"|---|---|---|---|")
            for k in sorted(a):
                print(f"| {k} | {a[k]:.6f} | {b[k]:.6f} | {b[k] - a[k]:+.6f} |")
            print(
                "pred-vs-pred rel err: mean {mean:.2e}  p99 {p99:.2e}  max {max:.2e}".format(
                    **report[tag][f"{name}_pred_rel_err"]
                )
            )

    print("\n" + json.dumps(report))


if __name__ == "__main__":
    main()
