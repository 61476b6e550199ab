"""Ground-truth-free inference: panorama images in, depth maps out.

    python -m omnifusion_tpu.cli.infer --input pano.png --checkpoint ckpt/best
    python -m omnifusion_tpu.cli.infer --input panos/ --model iterative \
        --iter 2 --checkpoint upstream.pth --save_ply

The reference has no serving path — its eval script (test.py) requires a
split list with ground-truth depth for every frame.  This entry point loads
a checkpoint once, jits the forward once, and sweeps arbitrary panoramas
(a file, a directory, or a glob), writing per-image raw depth (.npy, f32
metres), a colorized depth PNG, and optionally a point cloud (.ply).

Images follow the dataset-loader conventions (data/datasets.py): cv2 BGR
channel order preserved end to end (like the upstream loaders), INTER_AREA
resize to the ERP resolution, [0,1] scaling.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from omnifusion_tpu.cli.common import add_common_args, build_model

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_inputs(inp: str) -> list[str]:
    if os.path.isdir(inp):
        paths = [
            os.path.join(inp, f)
            for f in sorted(os.listdir(inp))
            if f.lower().endswith(_IMAGE_EXTS)
        ]
    elif os.path.isfile(inp):
        paths = [inp]
    else:
        paths = [
            p
            for p in sorted(glob.glob(inp))
            if os.path.isfile(p) and p.lower().endswith(_IMAGE_EXTS)
        ]
    if not paths:
        raise FileNotFoundError(f"no input images match {inp!r}")
    return paths


def output_stems(paths: list[str], save_path: str) -> list[str]:
    """Collision-safe output stems: basename, disambiguated with a counter
    when a glob matches duplicate basenames in different directories."""
    stems, used = [], {}
    for p in paths:
        base = os.path.splitext(os.path.basename(p))[0]
        n = used.get(base, 0)
        used[base] = n + 1
        stems.append(os.path.join(save_path, base if n == 0 else f"{base}_{n}"))
    return stems


def run_infer(args) -> list[str]:
    import contextlib

    import cv2
    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.cli.common import build_mesh
    from omnifusion_tpu.cli.test import load_variables
    from omnifusion_tpu.data.datasets import _read_rgb
    from omnifusion_tpu.utils import colorize, ply

    model, spec = build_model(args)
    variables = load_variables(args, model, spec)
    paths = list_inputs(args.input)
    stems = output_stems(paths, args.save_path)
    os.makedirs(args.save_path, exist_ok=True)

    confidence = True if args.model == "oneshot" else args.confidence

    mesh = build_mesh(args)
    batch_shard = None
    mesh_ctx = contextlib.nullcontext()
    if mesh is not None:
        from omnifusion_tpu.parallel import batch_sharding

        batch_shard = batch_sharding(mesh)
        mesh_ctx = jax.set_mesh(mesh)
        print(f"## mesh: {dict(mesh.shape)}")

    @jax.jit
    def forward(rgb):
        pred = model.apply(variables, rgb, train=False, confidence=confidence)
        if isinstance(pred, (list, tuple)):  # iterative returns all passes
            pred = pred[-1]
        return pred

    written = []
    with mesh_ctx:
        for start in range(0, len(paths), args.batch):
            chunk = paths[start : start + args.batch]
            # same read+resize convention as the training loaders
            frames = [
                _read_rgb(p, (spec.erp_w, spec.erp_h)).astype(np.float32) / 255.0
                for p in chunk
            ]
            batch = np.stack(frames)
            # keep the jit shape stable across the final short chunk
            pad = args.batch - len(chunk)
            if pad:
                batch = np.concatenate([batch, np.zeros_like(batch[:1]).repeat(pad, 0)])
            jb = jnp.asarray(batch)
            if batch_shard is not None and jb.shape[0] % dict(mesh.shape)["data"] == 0:
                jb = jax.device_put(jb, batch_shard)
            pred = np.asarray(forward(jb))[: len(chunk)]

            for stem, frame, depth in zip(stems[start : start + args.batch], frames, pred):
                depth = depth[..., 0] if depth.ndim == 3 else depth
                np.save(stem + "_depth.npy", depth.astype(np.float32))
                cv2.imwrite(stem + "_depth.png", colorize(depth, vmin=0)[..., ::-1])
                if args.save_ply:
                    xyz, colors = ply.depth_to_pointcloud(depth, frame[..., ::-1])
                    ply.write_ply(
                        stem + ".ply",
                        [xyz, colors],
                        ["x", "y", "z", "red", "green", "blue"],
                    )
                written.append(stem + "_depth.npy")
                print(f"-> {stem}_depth.npy  "
                      f"[{depth.min():.2f}, {depth.max():.2f}] m")
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(description="OmniFusion-TPU inference")
    add_common_args(parser, train=False)
    parser.add_argument(
        "--input", required=True, help="panorama image, directory, or glob"
    )
    args = parser.parse_args(argv)
    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()
    run_infer(args)


if __name__ == "__main__":
    main()
