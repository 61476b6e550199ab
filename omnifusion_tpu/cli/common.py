"""Shared CLI plumbing: the reference's flag surface, parsed properly.

Flag names mirror train_erp_depth.py:31-68 / test.py:34-65 so existing
configs translate 1:1.  Notably --patchsize is a proper "H,W" or "N" parser
(the reference declares type=list with a tuple default, which silently
breaks when passed on the CLI — SURVEY.md §2.8).
"""

from __future__ import annotations

import argparse
import os


def apply_runtime_env():
    """Honor JAX_PLATFORMS even when a platform plugin overrode it via
    jax.config at import time, and enable the persistent compile cache."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    from omnifusion_tpu.utils.compile_cache import enable_persistent_cache

    default_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    enable_persistent_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", default_cache))


def pair_arg(value: str) -> tuple[int, int]:
    parts = [p for p in value.replace("(", "").replace(")", "").split(",") if p.strip()]
    if len(parts) == 1:
        v = int(parts[0])
        return (v, v)
    if len(parts) == 2:
        return (int(parts[0]), int(parts[1]))
    raise argparse.ArgumentTypeError(f"expected 'N' or 'H,W', got {value!r}")


def add_common_args(parser: argparse.ArgumentParser, train: bool):
    parser.add_argument("--input_dir", default="./data/", help="dataset root path")
    parser.add_argument("--trainfile", default="./filenames/train.txt")
    parser.add_argument("--testfile", default="./filenames/test.txt")
    parser.add_argument(
        "--dataset",
        default="stanford",
        choices=["stanford", "matterport", "360d", "synthetic"],
    )
    parser.add_argument(
        "--synthetic_size",
        type=int,
        default=None,
        help="sample count for --dataset synthetic (default 32 train / 8 eval)",
    )
    parser.add_argument("--patchsize", type=pair_arg, default=(128, 128))
    parser.add_argument("--fov", type=float, default=80.0)
    parser.add_argument("--nrows", type=int, default=4, choices=[3, 4, 5, 6])
    parser.add_argument(
        "--erp_size", type=pair_arg, default=None,
        help="ERP resolution (default 512,1024; 256,512 for --dataset 360d)",
    )
    parser.add_argument("--iter", dest="iters", type=int, default=2)
    parser.add_argument("--confidence", action="store_true")
    parser.add_argument("--model", default="oneshot", choices=["oneshot", "iterative"])
    parser.add_argument("--batch", type=int, default=8 if train else 2)
    parser.add_argument("--checkpoint", default=None, help="checkpoint to load (orbax dir or torch .pth)")
    parser.add_argument("--save_path", default="./results/run")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--mesh",
        default="auto",
        help="device mesh as 'DATA[,MODEL]' counts, 'auto' (all local devices "
        "on the data axis — the reference's default nn.DataParallel behavior, "
        "train_erp_depth.py:143), or 'none' (single device, no mesh)",
    )
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    parser.add_argument(
        "--merge_dtype",
        default="f32",
        choices=["f32", "bf16", "f16"],
        help="precision of the confidence-merge gather (+10.5%% throughput "
        "for 16-bit; f16 costs only delta abs_rel ~4e-6 vs f32 while bf16 "
        "costs ~3e-4 — tools/eval_merge_dtype.py; both time identically on "
        "TPU, tools/bench_merge_variants.py)",
    )
    parser.add_argument(
        "--kernel_impl",
        default="xla",
        choices=["xla", "pallas", "pallas_full"],
        help="compute-kernel implementation for the projection blends: "
        "'pallas' removes XLA's retile/relayout data movement at wide "
        "batch (single-chip throughput mode; narrow batches "
        "auto-fall-back per op; gradients stay on the verified XLA "
        "transposed-table path).  'pallas_full' additionally routes the "
        "BACKWARD through the Pallas transposed kernel — use only behind a "
        "green tools/verify_kernels.py run on your chip",
    )
    parser.add_argument(
        "--resize_impl",
        default="conv",
        choices=["xla", "pallas", "stencil", "conv"],
        help="decoder 2x-upsample implementation, decoupled from "
        "--kernel_impl.  All four are numerically interchangeable (conv/"
        "stencil exact to 1e-7/1e-6 in value/grad — tests/test_layers.py); "
        "they differ only in speed.  Default 'conv' (separable depthwise "
        "lhs-dilated conv): its transpose is itself a conv, so fwd and bwd "
        "stay in conv layouts — on-chip A/B won both phases (fwd b=256 "
        "383.7 vs 400.9 ms xla; train b=64 268.7 vs 275.7 vs stencil 308.6 "
        "— measurements.log 2026-08-20)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize the encoder (trades ~19%% extra FLOPs for "
        "activation HBM; measured +11%% step time at b=64 and does NOT "
        "recover the b=128 OOM — see docs/TRAINING.md)",
    )
    parser.add_argument(
        "--no_transformer",
        action="store_true",
        help="legacy variant without global patch fusion (network_360d.py)",
    )
    if train:
        parser.add_argument("--epochs", type=int, default=100)
        parser.add_argument("--lr", type=float, default=1e-4)
        parser.add_argument("--weight_decay", type=float, default=0.01)
        parser.add_argument("--t0", type=int, default=5, help="cosine warm restart T_0")
        parser.add_argument("--t_mult", type=int, default=2)
        parser.add_argument("--visualize_interval", type=int, default=20)
        parser.add_argument("--val_interval", type=int, default=2, help="epochs between validations")
        parser.add_argument("--save_checkpoint", default=None, help="checkpoint dir (default save_path/ckpt)")
        parser.add_argument("--tensorboard_path", default=None)
        parser.add_argument("--workers", type=int, default=8)
        parser.add_argument(
            "--profile_dir", default=None,
            help="capture a jax.profiler trace of steps 10-14 of epoch 0",
        )
    else:
        parser.add_argument("--visualize_interval", type=int, default=20)
        parser.add_argument("--save_ply", action="store_true")
    return parser


def build_mesh(args):
    """Mesh from --mesh: None for single-device, else a (data, model) Mesh.

    'auto' puts the local devices on the data axis — the TPU-native
    equivalent of the reference's default multi-GPU nn.DataParallel wrap
    (train_erp_depth.py:143) — shrunk to the largest count that divides the
    batch (GSPMD shards evenly; DataParallel scattered unevenly).
    """
    import jax

    from omnifusion_tpu.parallel import make_mesh

    n_devices = len(jax.devices())
    spec = getattr(args, "mesh", "auto") or "auto"
    if spec == "none" or (spec == "auto" and n_devices == 1):
        return None
    if spec == "auto":
        batch = int(getattr(args, "batch", 0) or 0)
        n_data = max(
            (d for d in range(1, n_devices + 1) if batch % d == 0), default=1
        )
        if n_data <= 1:
            return None
        if n_data < n_devices:
            print(
                f"## mesh auto: data={n_data} of {n_devices} devices "
                f"(largest divisor of batch {batch}); pass --mesh to override"
            )
        return make_mesh(n_data=n_data, n_model=1, devices=jax.devices()[:n_data])
    try:
        parts = [int(p) for p in spec.split(",") if p.strip()]
        if not 1 <= len(parts) <= 2 or any(p < 1 for p in parts):
            raise ValueError
    except ValueError:
        raise SystemExit(
            f"--mesh: expected 'auto', 'none', or 'DATA[,MODEL]' counts, got {spec!r}"
        )
    n_data = parts[0]
    n_model = parts[1] if len(parts) > 1 else 1
    if n_data * n_model > n_devices:
        raise SystemExit(
            f"--mesh {spec!r} needs {n_data * n_model} devices but only "
            f"{n_devices} are available (platform={jax.default_backend()!r})"
        )
    return make_mesh(
        n_data=n_data, n_model=n_model, devices=jax.devices()[: n_data * n_model]
    )


def dump_run_config(args):
    """Provenance: record the exact run configuration in the results dir
    (the reference copies the script itself, train_erp_depth.py:87-88; a
    JSON of the resolved flags is the reproducible equivalent)."""
    import json
    import sys
    import time

    os.makedirs(args.save_path, exist_ok=True)
    payload = {
        "argv": sys.argv,
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "args": {k: repr(v) if not isinstance(v, (int, float, str, bool, type(None), list, tuple)) else v
                 for k, v in vars(args).items()},
    }
    with open(os.path.join(args.save_path, "run_config.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)


def resolve_erp_size(args):
    if args.erp_size is None:
        args.erp_size = (256, 512) if args.dataset == "360d" else (512, 1024)
    return args.erp_size


def build_model(args):
    import jax.numpy as jnp

    resolve_erp_size(args)

    from omnifusion_tpu.models import SphericalFusion, SphericalFusionIterative
    from omnifusion_tpu.projection import ProjectionSpec

    spec = ProjectionSpec.create(
        args.erp_size, args.patchsize, (args.fov, args.fov), args.nrows
    )
    dtype = jnp.bfloat16 if args.bf16 else None
    kw = dict(
        spec=spec,
        dtype=dtype,
        merge_dtype={"f32": None, "bf16": jnp.bfloat16, "f16": jnp.float16}[
            getattr(args, "merge_dtype", "f32")
        ],
        use_transformer=not getattr(args, "no_transformer", False),
        remat=getattr(args, "remat", False),
        kernel_impl=getattr(args, "kernel_impl", "xla"),
        resize_impl=getattr(args, "resize_impl", "conv"),
    )
    if args.model == "iterative":
        return SphericalFusionIterative(num_iters=args.iters, **kw), spec
    return SphericalFusion(**kw), spec


def build_dataset(args, split_file: str, train: bool):
    from omnifusion_tpu.data import make_dataset

    resolve_erp_size(args)

    if args.dataset == "synthetic":
        return make_dataset(
            "synthetic",
            size=getattr(args, "synthetic_size", None) or (32 if train else 8),
            pano_h=args.erp_size[0],
            pano_w=args.erp_size[1],
            seed=args.seed,
        )
    return make_dataset(
        args.dataset,
        args.input_dir,
        split_file,
        rotate=train,
        flip=train,
        seed=args.seed,
    )
