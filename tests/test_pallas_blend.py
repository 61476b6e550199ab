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


def test_pallas_rejects_narrow_lanes(small_spec):
    grids = build_pers2equi_grids(small_spec)
    ic, wc, tp, ti, tw = grids.capped
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    x = jnp.zeros((8, 2, n_in), jnp.float32)  # d_pad = 16 < 128 lanes
    with pytest.raises(ValueError, match="lane-aligned"):
        quad_gather_blend_pallas(x, ic, wc, tp, ti, tw, small_spec.patch_w, interpret=True)
