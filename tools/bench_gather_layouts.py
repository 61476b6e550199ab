"""Microbenchmark: gather operand layouts at the exact pers2equi merge shapes.

Candidates (same math, different memory layouts):
  A. column-gather: packed (4D, N_in), take axis=1   (current sparse_blend)
  B. quad-minor:    packed (D, N_in, 4), take axis=1 (round-1 layout, no pad)
  C. row-gather:    packed (N_in, 4D), take axis=0   (contiguous 256B slices)
  D. row-gather bf16: C with bfloat16 operand        (halves fetched bytes)

Run on the real TPU: python tools/bench_gather_layouts.py --batch 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnifusion_tpu.projection import ProjectionSpec, build_pers2equi_grids

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), 4)
    g = build_pers2equi_grids(spec)
    idx = jnp.asarray(g.idx)  # (N, K)
    w4 = jnp.asarray(g.w4)  # (N, K, 4)
    n, k = idx.shape
    n_in = spec.n_patches * spec.patch_h * spec.patch_w
    d = args.batch * args.channels
    stride = spec.patch_w
    rng = np.random.default_rng(0)
    print(f"D={d} N={n} K={k} N_in={n_in} indices={n*k}")

    def bench(name, fn, seeds=2):
        jfn = jax.jit(fn)
        float(jfn(jnp.float32(1.0)))  # compile
        t0 = time.perf_counter()
        for i in range(args.reps):
            float(jfn(jnp.float32(1.0 + 1e-6 * i)))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:34s} {dt*1e3:8.2f} ms")
        return dt

    base = jnp.asarray(rng.random((d, n_in), dtype=np.float32))

    def packed_rolls(s):
        return jnp.concatenate(
            [s, jnp.roll(s, -1, 1), jnp.roll(s, -stride, 1), jnp.roll(s, -(stride + 1), 1)],
            axis=0,
        )

    def layout_a(seed):
        s = base * seed
        p = packed_rolls(s)  # (4D, N_in)
        gth = jnp.take(p, idx.reshape(-1), axis=1).reshape(4, d, n, k)
        return jnp.einsum("qdnk,nkq->dn", gth, w4).sum()

    def layout_b(seed):
        s = base * seed
        p = jnp.stack(
            [s, jnp.roll(s, -1, 1), jnp.roll(s, -stride, 1), jnp.roll(s, -(stride + 1), 1)],
            axis=-1,
        )  # (D, N_in, 4)
        gth = jnp.take(p, idx.reshape(-1), axis=1).reshape(d, n, k, 4)
        return jnp.einsum("dnkq,nkq->dn", gth, w4).sum()

    def layout_c(seed):
        s = base * seed
        p = packed_rolls(s).T  # (N_in, 4D) row-major contiguous rows
        gth = jnp.take(p, idx.reshape(-1), axis=0).reshape(n, k, 4, d)
        return jnp.einsum("nkqd,nkq->nd", gth, w4).sum()

    def layout_d(seed):
        s = (base * seed).astype(jnp.bfloat16)
        p = packed_rolls(s).T
        gth = jnp.take(p, idx.reshape(-1), axis=0).reshape(n, k, 4, d)
        return jnp.einsum(
            "nkqd,nkq->nd", gth.astype(jnp.float32), w4
        ).sum()

    bench("A column-gather (4D, N_in)", layout_a)
    bench("B quad-minor (D, N_in, 4)", layout_b)
    bench("C row-gather (N_in, 4D)", layout_c)
    bench("D row-gather bf16", layout_d)


if __name__ == "__main__":
    main()
