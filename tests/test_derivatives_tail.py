"""Parity tests for the spherical-derivative tail and view re-insertion.

Covers the round-1 VERDICT missing #6: dr_dx/dphi_dx/dtheta_dx/dtheta_dy,
non-clip dphi/dtheta_horizontal, point-cloud dV_* (reference
spherical/derivatives.py:30-51, 73-131, 190-214) and the
transform_equi/transform_pers capability (util.py:40-60) via
extract_views/insert_views.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from omnifusion_tpu.geometry.sphere import create_spherical_grid
from omnifusion_tpu.ops import derivatives as D
from omnifusion_tpu.projection import extract_views
from omnifusion_tpu.projection.perspective import insert_views

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_spherical():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return pytest.importorskip("spherical")


@pytest.fixture(scope="module")
def sgrid():
    return create_spherical_grid(64)  # (32, 64, 2)


def _as_torch_grid(sgrid):
    import torch

    return torch.from_numpy(np.ascontiguousarray(sgrid.transpose(2, 0, 1))).float()[None]


def _ours_to_nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def test_dx_dy_derivatives_match_reference(ref_spherical, sgrid):
    tg = _as_torch_grid(sgrid)
    ours_grid = jnp.asarray(sgrid)[None]
    for ours_fn, ref_fn in [
        (D.dr_dx, ref_spherical.dr_dx),
        (D.dphi_dx, ref_spherical.dphi_dx),
        (D.dtheta_dx, ref_spherical.dtheta_dx),
        (D.dtheta_dy, ref_spherical.dtheta_dy),
    ]:
        ours = _ours_to_nchw(ours_fn(ours_grid))
        theirs = ref_fn(tg).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6, err_msg=ours_fn.__name__)


def test_horizontal_nonclip_match_reference(ref_spherical, sgrid):
    import torch

    tg = _as_torch_grid(sgrid)
    ours_grid = jnp.asarray(sgrid)[None]
    rng = np.random.default_rng(0)
    depth_np = (rng.random((1, 32, 64, 1)) * 8).astype(np.float32)
    depth_np[0, 3, 5, 0] = 0.0  # division blow-up -> reference zeroes inf
    t_depth = torch.from_numpy(depth_np.transpose(0, 3, 1, 2))

    ours = _ours_to_nchw(D.dphi_horizontal(ours_grid, jnp.asarray(depth_np), 0.26))
    theirs = ref_spherical.dphi_horizontal(tg, t_depth, 0.26).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    ours = _ours_to_nchw(D.dtheta_horizontal(ours_grid, jnp.asarray(depth_np), 0.26))
    theirs = ref_spherical.dtheta_horizontal(tg, t_depth, 0.26).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_pointcloud_derivatives_match_reference(ref_spherical):
    import torch

    rng = np.random.default_rng(1)
    pc = rng.random((1, 16, 24, 3)).astype(np.float32)
    t_pc = torch.from_numpy(pc.transpose(0, 3, 1, 2))
    ours_pc = jnp.asarray(pc)
    for ours_fn, ref_fn in [
        (D.dV_dx, ref_spherical.dV_dx),
        (D.dV_dy, ref_spherical.dV_dy),
        (D.dV_dz, ref_spherical.dV_dz),
        (D.dV_dxyz, ref_spherical.dV_dxyz),
    ]:
        ours = _ours_to_nchw(ours_fn(ours_pc))
        theirs = ref_fn(t_pc).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6, err_msg=ours_fn.__name__)


def test_insert_views_roundtrip_and_mask():
    """insert_views(extract_views(img)) reconstructs img inside the mask
    (transform_equi -> transform_pers composition, util.py:40-60)."""
    h, w = 128, 256
    rng = np.random.default_rng(2)
    img = jnp.asarray(
        np.asarray(
            jnp.clip(
                jnp.asarray(rng.random((1, 16, 32, 3), np.float32)), 0, 1
            )
        )
    )
    import jax

    img = jax.image.resize(img, (1, h, w, 3), "bilinear")  # smooth content
    centers = [(90.0, 0.0), (270.0, 20.0)]
    views = extract_views(img, centers, fov=(80, 80), size=(96, 96))
    equi, mask = insert_views(views, centers, fov=(80, 80), erp_size=(h, w))
    assert equi.shape == (1, 2, h, w, 3)
    assert mask.shape == (2, h, w, 1)

    # solid angle of an 80x80deg tangent frustum is a bit under 1/8 sphere
    frac = float(mask.mean())
    assert 0.05 < frac < 0.25, frac

    # reconstruction inside the mask (interior: erode away boundary pixels)
    m = np.asarray(mask[0, :, :, 0]) > 0
    interior = m & np.roll(m, 3, 0) & np.roll(m, -3, 0) & np.roll(m, 3, 1) & np.roll(m, -3, 1)
    err = np.abs(np.asarray(equi[0, 0]) - np.asarray(img[0]))[interior]
    assert err.mean() < 0.02, err.mean()

    # outside the mask the output is exactly zero
    assert float(jnp.abs(equi[0, 0] * (1 - mask[0])).max()) == 0.0
