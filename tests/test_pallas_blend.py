"""Pallas blend-reduce kernel vs the XLA sparse-blend path.

The kernel runs in interpreter mode on the CPU test mesh; on-chip parity is
covered by the identical-map construction (same tables, same gather) plus
the shootout tool (tools/bench_pallas_merge.py) which asserts a live
cross-check before timing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas
from omnifusion_tpu.ops.sparse_blend import capped_quad_gather_blend
from omnifusion_tpu.projection import ProjectionSpec
from omnifusion_tpu.projection.spec import build_pers2equi_grids


@pytest.fixture(scope="module")
def small_spec():
    return ProjectionSpec.create((64, 128), (16, 16), (80, 80), nrows=4)


def test_pallas_matches_capped_xla(small_spec):
    grids = build_pers2equi_grids(small_spec)
    ic, wc, tp, ti, tw = grids.capped
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 2, n_in), dtype=np.float32))
    ref = capped_quad_gather_blend(
        x, ic, wc, tp, ti, tw, small_spec.patch_w, channel_first=True
    )
    got = quad_gather_blend_pallas(
        x, ic, wc, tp, ti, tw, small_spec.patch_w, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_pallas_e2p_matches_xla(small_spec):
    from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas_cl
    from omnifusion_tpu.ops.sparse_blend import quad_gather_blend
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    grids = build_equi2pers_grids(small_spec)
    n_erp = small_spec.erp_h * small_spec.erp_w
    rng = np.random.default_rng(1)
    # d = 43*3 = 129 exercises the pad-up-to-lane-multiple path
    x = jnp.asarray(rng.random((43, n_erp, 3), dtype=np.float32))
    ref = quad_gather_blend(x, grids.idx, grids.w4, small_spec.erp_w)
    got = quad_gather_blend_pallas_cl(
        x, grids.idx, grids.w4, small_spec.erp_w, interpret=True
    )
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_pallas_backward_matches_xla(small_spec):
    from omnifusion_tpu.projection.ops import equi2pers, pers2equi_cf
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    gp = build_pers2equi_grids(small_spec)
    ge = build_equi2pers_grids(small_spec)
    rng = np.random.default_rng(3)
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    x = jnp.asarray(rng.random((64, 2, n_in), dtype=np.float32))
    g_ref = jax.grad(lambda x: (pers2equi_cf(x, gp) ** 2).sum())(x)
    g_got = jax.grad(lambda x: (pers2equi_cf(x, gp, impl="pallas") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4)

    xe = jnp.asarray(
        rng.random((43, small_spec.erp_h, small_spec.erp_w, 3), dtype=np.float32)
    )
    h_ref = jax.grad(lambda x: (equi2pers(x, ge) ** 2).sum())(xe)
    h_got = jax.grad(lambda x: (equi2pers(x, ge, impl="pallas") ** 2).sum())(xe)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref), atol=1e-5)


def test_narrow_batch_falls_back_to_xla(small_spec):
    # below one full 128-lane vector the wrapper must route to the XLA path
    # (identical results either way; this pins that no pallas shapes leak in)
    from omnifusion_tpu.projection.ops import equi2pers
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    grids = build_equi2pers_grids(small_spec)
    x = jnp.asarray(
        np.random.default_rng(2).random((2, small_spec.erp_h, small_spec.erp_w, 3), np.float32)
    )
    ref = equi2pers(x, grids)
    got = equi2pers(x, grids, impl="pallas")  # d=6 -> fallback
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
