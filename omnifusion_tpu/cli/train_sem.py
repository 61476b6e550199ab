"""Semantic-segmentation training entry point.

A WORKING replacement for the reference's train_erp_sem.py (which imports a
nonexistent dataset module and calls the model with a legacy signature —
SURVEY.md §2.5/2.8): geometry-aware trunk + class-logit head, cross-entropy
with ignore-index -1, mIoU validation (iou.py parity).

    python -m omnifusion_tpu.cli.train_sem --dataset semantic --input_dir ... \
        --trainfile lists/train.txt --num_classes 13 --epochs 60
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from omnifusion_tpu.cli.common import add_common_args, apply_runtime_env


def run_training_sem(args) -> dict:
    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.data import DataLoader, SemanticDataset, SyntheticSemanticDataset
    from omnifusion_tpu.models import SphericalFusionSeg, cross_entropy_ignore
    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.training import CheckpointManager, create_train_state, make_optimizer
    from omnifusion_tpu.utils import evaluate_iou

    from omnifusion_tpu.cli.common import resolve_erp_size

    resolve_erp_size(args)
    spec = ProjectionSpec.create(
        args.erp_size, args.patchsize, (args.fov, args.fov), args.nrows
    )
    model = SphericalFusionSeg(
        spec=spec,
        num_classes=args.num_classes,
        use_transformer=not args.no_transformer,
        dtype=jnp.bfloat16 if args.bf16 else None,
        kernel_impl=getattr(args, "kernel_impl", "xla"),
    )

    if args.dataset == "synthetic":
        train_ds = SyntheticSemanticDataset(
            32, args.erp_size[0], args.erp_size[1], args.num_classes, args.seed
        )
        val_ds = SyntheticSemanticDataset(
            8, args.erp_size[0], args.erp_size[1], args.num_classes, args.seed + 1
        )
    else:
        train_ds = SemanticDataset(args.input_dir, args.trainfile, rotate=True, flip=True)
        val_ds = SemanticDataset(args.input_dir, args.testfile)
    train_loader = DataLoader(train_ds, args.batch, shuffle=True, num_workers=args.workers)
    val_loader = DataLoader(val_ds, args.batch, shuffle=False, num_workers=2, drop_last=False)

    tx = make_optimizer(
        args.lr, args.weight_decay, args.t0, args.t_mult,
        steps_per_epoch=max(len(train_loader), 1),
    )
    sample = jnp.zeros((1, spec.erp_h, spec.erp_w, 3))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), sample, tx)
    from omnifusion_tpu.cli.common import dump_run_config

    dump_run_config(args)
    mgr = CheckpointManager(args.save_checkpoint or os.path.join(args.save_path, "ckpt"))

    @jax.jit
    def train_step(state, rgb, labels):
        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgb,
                train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_ignore(logits, labels), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, stats), loss

    @jax.jit
    def predict(params, batch_stats, rgb):
        logits = model.apply({"params": params, "batch_stats": batch_stats}, rgb, train=False)
        return jnp.argmax(logits, axis=-1)

    import contextlib

    from omnifusion_tpu.cli.common import build_mesh

    mesh = build_mesh(args)
    batch_shard = None
    mesh_ctx = contextlib.nullcontext()
    if mesh is not None:
        from omnifusion_tpu.parallel import batch_sharding

        batch_shard = batch_sharding(mesh)
        mesh_ctx = jax.set_mesh(mesh)
        print(f"## mesh: {dict(mesh.shape)}")

    def put(x):
        x = jnp.asarray(x)
        if batch_shard is not None and x.shape[0] % dict(mesh.shape)["data"] == 0:
            return jax.device_put(x, batch_shard)
        return x

    history: dict = {"train_loss": [], "miou": []}
    best_miou = 0.0
    with mesh_ctx:
        for epoch in range(args.epochs):
            t0 = time.time()
            pending = []  # device scalars; sync once per epoch
            for batch in train_loader:
                state, loss = train_step(state, put(batch["rgb"]), put(batch["labels"]))
                pending.append(loss)
            losses = [float(x) for x in pending]
            mean_loss = float(np.mean(losses)) if losses else float("nan")
            history["train_loss"].append(mean_loss)
            mgr.save(state, "latest")

            preds, gts = [], []
            for batch in val_loader:
                p = predict(state.params, state.batch_stats, put(batch["rgb"]))
                preds.extend(np.asarray(p))
                gts.extend(np.asarray(batch["labels"]))
            miou, _ = evaluate_iou(preds, gts, args.num_classes)
            history["miou"].append(miou)
            print(f"epoch {epoch}: loss {mean_loss:.4f}  mIoU {miou:.4f}  ({time.time()-t0:.1f}s)")
            if miou > best_miou:
                best_miou = miou
                mgr.save(state, "latest", best=True)
    history["best_miou"] = best_miou
    return history


def main(argv=None):
    parser = argparse.ArgumentParser(description="OmniFusion-TPU semantic segmentation")
    add_common_args(parser, train=True)
    parser.add_argument("--num_classes", type=int, default=13)
    args = parser.parse_args(argv)
    apply_runtime_env()
    run_training_sem(args)


if __name__ == "__main__":
    main()
