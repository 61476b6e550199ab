import numpy as np
import jax.numpy as jnp

from omnifusion_tpu.geometry import layout, sphere, gnomonic


def test_patch_counts():
    assert layout.num_patches(3) == 10
    assert layout.num_patches(4) == 18
    assert layout.num_patches(5) == 26
    assert layout.num_patches(6) == 46


def test_patch_centers_nrows4():
    c = layout.patch_centers(4)
    assert c.shape == (18, 2)
    # first row: 3 columns at theta 60/180/300, phi -67.5
    np.testing.assert_allclose(c[:3, 0], [60.0, 180.0, 300.0])
    np.testing.assert_allclose(c[:3, 1], -67.5)
    # middle rows: 6 columns
    np.testing.assert_allclose(c[3:9, 0], np.arange(6) * 60.0 + 30.0)
    np.testing.assert_allclose(c[3:9, 1], -22.5)


def test_uv_xyz_roundtrip():
    rng = np.random.default_rng(0)
    uv = np.stack(
        [
            rng.uniform(-np.pi * 0.999, np.pi * 0.999, 1000),
            rng.uniform(-np.pi / 2 * 0.999, np.pi / 2 * 0.999, 1000),
        ],
        axis=-1,
    )
    xyz = sphere.uv2xyz_np(uv)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), 1.0, atol=1e-12)
    uv_back = np.asarray(sphere.xyz2uv(jnp.asarray(xyz)))
    np.testing.assert_allclose(uv_back, uv, atol=1e-4)  # f32 device math


def test_gnomonic_forward_inverse_roundtrip():
    rng = np.random.default_rng(1)
    theta_c, phi_c = 0.7, 0.3
    x = rng.uniform(-0.5, 0.5, 500)
    y = rng.uniform(-0.5, 0.5, 500)
    lon, lat = gnomonic.forward(x, y, theta_c, phi_c)
    x2, y2, cos_c = gnomonic.inverse(lon, lat, theta_c, phi_c)
    assert (cos_c > 0).all()
    np.testing.assert_allclose(x2, x, atol=1e-10)
    np.testing.assert_allclose(y2, y, atol=1e-10)


def test_gnomonic_center_maps_to_center():
    lon, lat = gnomonic.forward(np.array([0.0]), np.array([0.0]), 1.2, -0.4)
    np.testing.assert_allclose(lon, 1.2)
    np.testing.assert_allclose(lat, -0.4)


def test_spherical_grid_shapes():
    g = sphere.create_spherical_grid(64)
    assert g.shape == (32, 64, 2)
    # phi starts at the horizontal shift
    np.testing.assert_allclose(g[0, 0, 0], -np.pi - np.pi / 2)
    np.testing.assert_allclose(g[0, 0, 1], -np.pi / 2)
