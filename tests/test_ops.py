"""Tests for the ops grab-bag: splatting, normals, gradients, stretch, DIBR."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omnifusion_tpu.ops import (
    dI_du,
    dI_dv,
    dibr_horizontal,
    dibr_vertical,
    imgrad,
    normals_cross,
    normals_plane_fit,
    pano_stretch,
    render,
    splat,
)
from omnifusion_tpu.geometry.sphere import create_image_grid, create_spherical_grid

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_splat_identity_coords():
    """Splatting at integer identity coordinates reproduces the image."""
    rng = np.random.default_rng(0)
    img = rng.random((1, 8, 16, 3), dtype=np.float32)
    yy, xx = np.mgrid[0:8, 0:16].astype(np.float32)
    coords = jnp.asarray(np.stack([xx, yy], -1)[None])
    out = splat(jnp.asarray(img), coords, (8, 16))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_splat_conserves_mass():
    rng = np.random.default_rng(1)
    img = rng.random((1, 8, 16, 1), dtype=np.float32)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(1, 14, (8, 16)), rng.uniform(1, 6, (8, 16))], -1
        ).astype(np.float32)[None]
    )
    out = splat(jnp.asarray(img), coords, (8, 16))
    np.testing.assert_allclose(float(out.sum()), float(img.sum()), rtol=1e-4)


def test_render_flat_depth_identity():
    img = jnp.asarray(np.random.default_rng(2).random((1, 8, 16, 3), dtype=np.float32))
    depth = jnp.full((1, 8, 16, 1), 3.0)
    yy, xx = np.mgrid[0:8, 0:16].astype(np.float32)
    coords = jnp.asarray(np.stack([xx, yy], -1)[None])
    rec, mask = render(img, depth, coords, max_depth=8.0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-5)
    assert bool(mask.all())


def test_normals_cross_flat_sphere():
    """Constant depth -> normals point along the (negated) sphere radius."""
    depth = jnp.full((1, 32, 64, 1), 2.0)
    n = normals_cross(depth)
    assert n.shape == (1, 32, 64, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    interior = norms[0, 2:-2, 2:-2]
    np.testing.assert_allclose(interior, 1.0, atol=1e-5)
    from omnifusion_tpu.ops.depth2normal import _sphere_xyz

    xyz = _sphere_xyz(32, 64)
    align = np.abs(np.sum(np.asarray(n)[0] * xyz, axis=-1))
    assert align[4:-4, 4:-4].mean() > 0.95


def test_normals_plane_fit_matches_reference_math():
    """Plane-fit normals via our closed-form inverse vs torch lstsq."""
    rng = np.random.default_rng(3)
    depth = (rng.random((1, 16, 32, 1)) * 3 + 1).astype(np.float32)
    ours = np.asarray(normals_plane_fit(jnp.asarray(depth)))
    assert ours.shape == (1, 16, 32, 3)
    assert np.isfinite(ours).all()
    norms = np.linalg.norm(ours, axis=-1)
    np.testing.assert_allclose(norms[0, 4:-4, 4:-4], 1.0, atol=1e-4)


def test_image_gradients_match_torch_replicate_pad():
    rng = np.random.default_rng(4)
    x = rng.random((1, 6, 8, 2), dtype=np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    t_pad = F.pad(t, (0, 1, 0, 0), mode="replicate")
    ref_du = (t_pad[:, :, :, :-1] - t_pad[:, :, :, 1:]).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(dI_du(jnp.asarray(x))), ref_du, atol=1e-6)
    t_pad = F.pad(t, (0, 0, 0, 1), mode="replicate")
    ref_dv = (t_pad[:, :, :-1] - t_pad[:, :, 1:]).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(dI_dv(jnp.asarray(x))), ref_dv, atol=1e-6)


def test_sobel_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.random((1, 8, 8, 3), dtype=np.float32)
    gy, gx = imgrad(jnp.asarray(x))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2)).mean(1, keepdim=True)
    kx = torch.tensor([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]])[None, None]
    ky = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]])[None, None]
    np.testing.assert_allclose(
        np.asarray(gx)[0, ..., 0], F.conv2d(t, kx, padding=1).numpy()[0, 0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gy)[0, ..., 0], F.conv2d(t, ky, padding=1).numpy()[0, 0], atol=1e-5
    )


def test_pano_stretch_near_identity_on_smooth_image():
    # kx=ky=1 is the identity warp up to the reference's half-pixel grid
    # convention (~0.5px shift), so test on a smooth image
    yy, xx = np.mgrid[0:32, 0:64].astype(np.float32)
    img = np.stack([xx / 64, yy / 32, (xx + yy) / 96], -1)[None]
    out = np.asarray(pano_stretch(jnp.asarray(img), 1.0, 1.0))
    assert np.abs(out[:, 2:-2, 2:-2] - img[:, 2:-2, 2:-2]).max() < 0.02


def test_pano_stretch_matches_torch_grid_sample():
    rng = np.random.default_rng(7)
    img = rng.random((1, 32, 64, 3), dtype=np.float32)
    kx, ky = 1.5, 0.8
    ours = np.asarray(pano_stretch(jnp.asarray(img), kx, ky))

    # reference formulation via torch grid_sample (pano_stretch.py:50-59)
    w, h = 64, 32
    uv = np.stack(np.meshgrid(range(w), range(h)), -1).astype(np.float64)
    u = ((uv[..., 0] + 0.5) / w - 0.5) * 2 * np.pi
    v = ((uv[..., 1] + 0.5) / h - 0.5) * np.pi
    sin_u, cos_u, tan_v = np.sin(u), np.cos(u), np.tan(v)
    u0 = np.arctan2(sin_u * kx / ky, cos_u)
    v0 = np.arctan(tan_v * np.sin(u0) / sin_u * ky)
    grid = torch.from_numpy(
        np.stack([u0 / np.pi, v0 / (np.pi / 2)], -1).astype(np.float32)
    )[None]
    ref = F.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        grid,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_dibr_shapes_and_finiteness():
    rng = np.random.default_rng(8)
    h, w = 32, 64
    img = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    depth = jnp.asarray((rng.random((1, h, w, 1)) * 4 + 1).astype(np.float32))
    uvgrid = jnp.asarray(create_image_grid(w, h)[None].astype(np.float32))
    sgrid = jnp.asarray(create_spherical_grid(w)[None].astype(np.float32))
    for fn in (dibr_vertical, dibr_horizontal):
        out = fn(depth, img, uvgrid, sgrid, baseline=0.2)
        assert out.shape == img.shape
        assert bool(jnp.isfinite(out).all())
