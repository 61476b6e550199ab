"""Generate parity golden fixtures by running the torch reference once.

Run from the repo root with the reference checkout available:

    python tools/make_goldens.py --reference /root/reference

Outputs .npz fixtures under tests/goldens/.  The fixtures are committed data;
tests skip gracefully when a fixture is missing.  This script is the only
place that executes reference code, and it does so via import (no code is
copied into this repo).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "goldens"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch
    import torch.nn.functional as F
    from equi_pers.equi2pers_v3 import equi2pers as t_equi2pers
    from equi_pers.pers2equi_v3 import pers2equi as t_pers2equi

    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1234)

    configs = [
        # (name, erp_h, erp_w, patch, fov, nrows, half)
        ("proj_128x256_p32_f80_n4", 128, 256, 32, 80, 4, False),
        ("proj_128x256_p32_f80_n3", 128, 256, 32, 80, 3, False),
        ("proj_128x256_p32_f80_n5", 128, 256, 32, 80, 5, False),
        ("proj_128x256_p32_f80_n6", 128, 256, 32, 80, 6, False),
        ("proj_256x512_p64_f80_n4", 256, 512, 64, 80, 4, False),
        ("proj_128x256_p32_f52_n4", 128, 256, 32, 52, 4, False),
        # FLAGSHIP (canonical eval config, test.py:45-52 at our patch-128
        # token width): stored float16 to bound fixture size — the input is
        # f16-quantized BEFORE both sides run, so the comparison itself is
        # exact-input f32 compute with ~1e-3 output quantization.
        ("proj_512x1024_p128_f80_n4", 512, 1024, 128, 80, 4, True),
    ]

    for name, erp_h, erp_w, patch, fov, nrows, half in configs:
        if (OUT / f"{name}.npz").exists():
            print(f"skip {name} (exists)")
            continue
        img = rng.random((1, 3, erp_h, erp_w), dtype=np.float32)
        if half:
            img = img.astype(np.float16).astype(np.float32)
        t_img = torch.from_numpy(img)
        pers, xyz, uv, center_p = t_equi2pers(
            t_img, (fov, fov), nrows, patch_size=(patch, patch)
        )
        # pers: (bs, C, h, w, P)
        # run pers2equi in a temp cwd so its ./grid cache never pollutes
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as td:
            os.chdir(td)
            try:
                erp_rec = t_pers2equi(
                    pers, (fov, fov), nrows, (patch, patch), (erp_h, erp_w), name
                )
            finally:
                os.chdir(cwd)
        if half:
            # big flagship fixture: keep only the projection pair, f16
            np.savez_compressed(
                OUT / f"{name}.npz",
                erp=img.astype(np.float16),
                pers=pers.numpy().astype(np.float16),
                erp_rec=erp_rec.numpy().astype(np.float16),
                fov=np.array([fov, fov]),
                nrows=np.array(nrows),
                patch=np.array([patch, patch]),
            )
        else:
            np.savez_compressed(
                OUT / f"{name}.npz",
                erp=img,
                pers=pers.numpy(),
                xyz=xyz.numpy(),
                uv=uv.numpy(),
                center_p=center_p.numpy(),
                erp_rec=erp_rec.numpy(),
                fov=np.array([fov, fov]),
                nrows=np.array(nrows),
                patch=np.array([patch, patch]),
            )
        print(f"wrote {name}: pers {tuple(pers.shape)} rec {tuple(erp_rec.shape)}")


if __name__ == "__main__":
    main()
