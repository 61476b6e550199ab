"""Evaluation entry point (parity: test.py of the reference).

    python -m omnifusion_tpu.cli.test --dataset stanford --input_dir ... \
        --testfile filenames/test_stanford2d3d.txt --model iterative --iter 2 \
        --checkpoint results/run/ckpt/best

Median-scaled metric suite (abs_rel, sq_rel, lin/log RMSE, delta<1.25^k)
weighted by valid-pixel count; optional PNG/PLY dumps every
--visualize_interval batches (test.py:223-240).  --checkpoint accepts an
orbax checkpoint directory or a reference torch .pth.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from omnifusion_tpu.cli.common import add_common_args, build_dataset, build_model


def load_variables(args, model, spec):
    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.models.torch_import import (
        import_iterative_checkpoint,
        import_oneshot_checkpoint,
        load_torch_state_dict,
    )
    from omnifusion_tpu.training.checkpoint import CheckpointManager

    if args.checkpoint and os.path.isfile(args.checkpoint):
        sd = load_torch_state_dict(args.checkpoint)
        if args.model == "iterative":
            return import_iterative_checkpoint(sd)
        return import_oneshot_checkpoint(sd)
    if args.checkpoint:
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or args.checkpoint)
        name = os.path.basename(args.checkpoint) or "best"
        if mgr.exists(name):
            return mgr.restore_variables(name)
        raise FileNotFoundError(f"checkpoint {args.checkpoint!r} not found")
    print("## no checkpoint given: evaluating a randomly initialized model")
    rgb = jnp.zeros((1, spec.erp_h, spec.erp_w, 3))
    return jax.jit(lambda: model.init(jax.random.PRNGKey(0), rgb))()


def run_eval(args) -> dict:
    import contextlib

    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.cli.common import build_mesh
    from omnifusion_tpu.data import DataLoader
    from omnifusion_tpu.evaluation import MetricAccumulator
    from omnifusion_tpu.training import make_eval_step
    from omnifusion_tpu.utils import colorize, ply

    model, spec = build_model(args)
    variables = load_variables(args, model, spec)
    ds = build_dataset(args, args.testfile, train=False)
    loader = DataLoader(ds, args.batch, shuffle=False, num_workers=2, drop_last=False)
    # the one-shot model always merges with confidence (spherical_model.py:238);
    # the iterative eval defaults to no-confidence like test.py:198
    confidence = True if args.model == "oneshot" else args.confidence
    eval_step = make_eval_step(model, confidence=confidence)

    mesh = build_mesh(args)
    batch_shard = None
    mesh_ctx = contextlib.nullcontext()
    if mesh is not None:
        from omnifusion_tpu.parallel import batch_sharding

        batch_shard = batch_sharding(mesh)
        mesh_ctx = jax.set_mesh(mesh)
        print(f"## mesh: {dict(mesh.shape)}")

    from omnifusion_tpu.cli.common import dump_run_config

    dump_run_config(args)
    acc = MetricAccumulator()
    with mesh_ctx:
        for batch_idx, batch in enumerate(loader):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            if batch_shard is not None and jb["rgb"].shape[0] % dict(mesh.shape)["data"] == 0:
                jb = jax.device_put(jb, batch_shard)
            metrics, n, pred = eval_step(
                variables["params"], variables.get("batch_stats", {}), jb
            )
            acc.update({k: float(v) for k, v in metrics.items()}, float(n))

            if args.visualize_interval and batch_idx % args.visualize_interval == 0:
                pred_np = np.asarray(pred[0])
                err = np.abs(batch["depth"][0] - pred_np) * batch["mask"][0]
                err[err < 0.1] = 0  # error-floor display rule (test.py:202-203)
                try:
                    import cv2

                    base = os.path.join(args.save_path, f"{batch_idx:04d}")
                    # loader keeps cv2's BGR order (reference test.py:230-231
                    # writes it straight through); imwrite expects BGR too
                    cv2.imwrite(base + "_rgb.png", (batch["rgb"][0] * 255).astype(np.uint8))
                    cv2.imwrite(base + "_pred.png", colorize(pred_np, vmin=0)[..., ::-1])
                    cv2.imwrite(base + "_gt.png", colorize(batch["depth"][0], vmin=0)[..., ::-1])
                    cv2.imwrite(base + "_error.png", colorize(err, vmin=0)[..., ::-1])
                except ImportError:
                    pass
                if args.save_ply:
                    # flip BGR->RGB to match the red/green/blue labels
                    # (the reference instead labels its BGR data b,g,r —
                    # test.py:239-240; infer.py here does the same flip)
                    xyz, colors = ply.depth_to_pointcloud(pred_np, batch["rgb"][0][..., ::-1])
                    ply.write_ply(
                        os.path.join(args.save_path, f"{batch_idx:04d}_pred.ply"),
                        [xyz, colors],
                        ["x", "y", "z", "red", "green", "blue"],
                    )

    avg = acc.averages()
    print("Avg. Abs. Rel. Error      : {:.4f}".format(avg.get("abs_rel", float("nan"))))
    print("Avg. Sq. Rel. Error       : {:.4f}".format(avg.get("sq_rel", float("nan"))))
    print("Avg. Lin. RMS Error       : {:.4f}".format(np.sqrt(avg.get("lin_rms_sq", float("nan")))))
    print("Avg. Log. RMS Error       : {:.4f}".format(np.sqrt(avg.get("log_rms_sq", float("nan")))))
    print("Inlier D1                 : {:.4f}".format(avg.get("d1", float("nan"))))
    print("Inlier D2                 : {:.4f}".format(avg.get("d2", float("nan"))))
    print("Inlier D3                 : {:.4f}".format(avg.get("d3", float("nan"))))
    return avg


def main(argv=None):
    parser = argparse.ArgumentParser(description="OmniFusion-TPU evaluation")
    add_common_args(parser, train=False)
    args = parser.parse_args(argv)
    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()
    run_eval(args)


if __name__ == "__main__":
    main()
