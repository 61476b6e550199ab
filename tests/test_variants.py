"""Tests for projection variants: uniform layout, arbitrary perspective views."""

import numpy as np
import jax
import jax.numpy as jnp

from omnifusion_tpu.geometry.layout import uniform_patch_centers
from omnifusion_tpu.projection import (
    ProjectionSpec,
    build_equi2pers_grids,
    build_pers2equi_grids,
    equi2pers,
    extract_views,
    pers2equi,
)


def test_uniform_centers():
    c = uniform_patch_centers(4, 6)
    assert c.shape == (24, 2)
    np.testing.assert_allclose(c[0], (180 - 150, -67.5))  # first col midpoint
    np.testing.assert_allclose(sorted(set(c[:, 1])), [-67.5, -22.5, 22.5, 67.5])


def test_uniform_layout_roundtrip():
    spec = ProjectionSpec.create((64, 128), (16, 16), (80, 80), nrows=4, layout="uniform:4x6")
    assert spec.n_patches == 24
    img = jax.image.resize(
        jnp.asarray(np.random.default_rng(0).random((1, 8, 16, 3), np.float32)),
        (1, 64, 128, 3),
        "bilinear",
    )
    pers = equi2pers(img, build_equi2pers_grids(spec))
    assert pers.shape == (1, 24, 16, 16, 3)
    rec = pers2equi(pers, build_pers2equi_grids(spec))
    mid = np.asarray(rec[:, 16:48])
    rmse = np.sqrt(np.mean((mid - np.asarray(img[:, 16:48])) ** 2))
    assert rmse < 0.1, rmse


def test_extract_views_center_pixel_matches_direction():
    """The view center pixel must sample the ERP at the view direction."""
    h, w = 128, 256
    yy, xx = np.mgrid[0:h, 0:w]
    img = jnp.asarray(
        np.stack([xx / w, yy / h, np.zeros_like(xx)], -1).astype(np.float32)[None]
    )
    views = extract_views(img, [(90.0, 0.0), (270.0, 30.0)], fov=(60, 60), size=(65, 65))
    assert views.shape == (1, 2, 65, 65, 3)
    # view 0: theta=90deg -> lon_n = 90/180-1 = -0.5 -> x = 0.25*(w-1)
    center = np.asarray(views[0, 0, 32, 32])
    np.testing.assert_allclose(center[0], 0.25 * (w - 1) / w, atol=0.01)
    np.testing.assert_allclose(center[1], 0.5 * (h - 1) / h, atol=0.01)
    # view 1: theta=270 -> lon_n = 0.5 -> x = 0.75*(w-1); phi=30 -> y = (30/90/2+0.5)*(h-1)
    center = np.asarray(views[0, 1, 32, 32])
    np.testing.assert_allclose(center[0], 0.75 * (w - 1) / w, atol=0.01)
    np.testing.assert_allclose(center[1], (0.5 + 30.0 / 180.0) * (h - 1) / h, atol=0.01)


def test_extract_views_straight_lines():
    """Pinhole projection maps great circles through the view center to
    straight lines: the horizon stays a straight row for phi=0 views."""
    h, w = 128, 256
    yy = np.mgrid[0:h, 0:w][0]
    # one-hot band at the equator
    img = jnp.asarray((np.abs(yy - h / 2) < 2).astype(np.float32)[None, ..., None])
    views = extract_views(img, [(180.0, 0.0)], fov=(90, 90), size=(64, 64))
    band = np.asarray(views[0, 0, :, :, 0])
    rows = band.sum(axis=1)
    assert rows.argmax() in (31, 32, 33)
    assert (band[:28].sum() + band[-28:].sum()) < 0.1 * band.sum()
