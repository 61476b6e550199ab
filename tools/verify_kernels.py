"""One-command on-chip proof of the Pallas kernels.

Runs every Pallas kernel (merge blend fwd, e2p blend fwd, transposed VJP,
2x upsample) at a compile-bounded spec on the current backend and checks
it against the XLA reference path.  Prints one PASS/FAIL line per kernel.

    python tools/verify_kernels.py            # real TPU via the tunnel
    python tools/verify_kernels.py --cpu      # interpret mode
    JAX_PLATFORMS=cpu python tools/verify_kernels.py   # same (honored via
                                              # cli.common.apply_runtime_env)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from omnifusion_tpu.cli.common import apply_runtime_env

    apply_runtime_env()
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.projection.ops import equi2pers, pers2equi_cf
    from omnifusion_tpu.projection.spec import (
        build_equi2pers_grids,
        build_pers2equi_grids,
    )
    from omnifusion_tpu.ops.pallas_resize import upsample2x_bilinear

    print(f"backend: {jax.default_backend()}", flush=True)
    spec = ProjectionSpec.create((128, 256), (32, 32), (80, 80), nrows=4)
    gp, ge = build_pers2equi_grids(spec), build_equi2pers_grids(spec)
    rng = np.random.default_rng(0)
    failures = 0

    def report(name, delta, tol):
        nonlocal failures
        ok = delta < tol
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:28s} max|delta| = {delta:.3e}  (tol {tol:g})", flush=True)

    n_in = spec.n_patches * spec.patch_h * spec.patch_w
    x = jnp.asarray(rng.random((64, 2, n_in), dtype=np.float32))
    ref = jax.jit(lambda x: pers2equi_cf(x, gp))(x)
    got = jax.jit(lambda x: pers2equi_cf(x, gp, impl="pallas"))(x)
    report("merge blend fwd", float(jnp.abs(got - ref).max()), 1e-5)

    xe = jnp.asarray(rng.random((64, spec.erp_h, spec.erp_w, 3), dtype=np.float32))
    refe = jax.jit(lambda x: equi2pers(x, ge))(xe)
    gote = jax.jit(lambda x: equi2pers(x, ge, impl="pallas"))(xe)
    report("e2p blend fwd", float(jnp.abs(gote - refe).max()), 1e-5)

    # the PROMOTED merge dtype: f16 rides the kernel as int16 bits with an
    # exact in-kernel integer decode (mosaic rejects the f16 vector type).
    # Reference = the f32 blend of the same (f16-rounded) values; tolerance
    # covers the XLA f16 path's own accumulation rounding checked in
    # tests/test_pallas_blend.py.
    x16 = x.astype(jnp.float16)
    ref16 = jax.jit(lambda x: pers2equi_cf(x.astype(jnp.float32), gp))(x16)
    got16 = jax.jit(lambda x: pers2equi_cf(x, gp, impl="pallas"))(x16)
    report("merge blend fwd f16", float(jnp.abs(got16.astype(jnp.float32) - ref16).max()), 2e-3)

    g_ref = jax.jit(jax.grad(lambda x: (pers2equi_cf(x, gp) ** 2).sum()))(x)
    g_got = jax.jit(jax.grad(lambda x: (pers2equi_cf(x, gp, impl="pallas") ** 2).sum()))(x)
    report("merge transposed bwd", float(jnp.abs(g_got - g_ref).max()), 1e-3)

    h_ref = jax.jit(jax.grad(lambda x: (equi2pers(x, ge) ** 2).sum()))(xe)
    h_got = jax.jit(jax.grad(lambda x: (equi2pers(x, ge, impl="pallas") ** 2).sum()))(xe)
    report("e2p transposed bwd", float(jnp.abs(h_got - h_ref).max()), 1e-3)

    xr = jnp.asarray(rng.random((8, 32, 32, 32), dtype=np.float32))
    refr = jax.jit(lambda x: jax.image.resize(x, (8, 64, 64, 32), method="bilinear"))(xr)
    gotr = jax.jit(lambda x: upsample2x_bilinear(x))(xr)
    report("2x upsample", float(jnp.abs(gotr - refr).max()), 1e-5)

    print("ALL PASS" if not failures else f"{failures} FAILURES", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
