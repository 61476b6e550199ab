"""Coverage for remaining utilities: prefetch, spherical helpers, profiling."""

import numpy as np
import jax.numpy as jnp

from omnifusion_tpu.data import DataLoader, SyntheticDataset
from omnifusion_tpu.geometry.sphere import (
    coords_3d,
    create_spherical_grid,
    spherical_confidence,
    uv2coords,
)
from omnifusion_tpu.ops.derivatives import (
    disparity_to_depth_vertical,
    dtheta_vertical,
)
from omnifusion_tpu.utils.profiling import Throughput


def test_prefetch_to_device_yields_all_batches():
    ds = SyntheticDataset(size=8, pano_h=32, pano_w=64)
    dl = DataLoader(ds, batch_size=2, num_workers=1)
    plain = list(dl)
    pre = list(dl.prefetch_to_device(size=2))
    assert len(pre) == len(plain) == 4
    for a, b in zip(plain, pre):
        assert b["rgb"].shape == a["rgb"].shape
        assert hasattr(b["rgb"], "devices")  # device-resident


def test_spherical_confidence_fades_at_poles():
    g = jnp.asarray(create_spherical_grid(64).astype(np.float32))
    w = np.asarray(spherical_confidence(g))
    # theta (latitude) rows: first row near -pi/2 -> cos ~ 0
    assert w[0].max() < 0.1
    assert w[16].max() > 0.5  # equator row


def test_coords_3d_radius():
    g = jnp.asarray(create_spherical_grid(64).astype(np.float32))
    pts = np.asarray(coords_3d(g, jnp.full(g.shape[:-1], 2.0)))
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 2.0, atol=1e-5)


def test_uv2coords_range():
    uv = jnp.asarray(np.zeros((4, 2), np.float32))
    c = np.asarray(uv2coords(uv, 512, 256))
    np.testing.assert_allclose(c[:, 0], 256.5)
    np.testing.assert_allclose(c[:, 1], 128.5)


def test_disparity_depth_inverse_pair():
    g = jnp.asarray(create_spherical_grid(64).astype(np.float32))[None]
    depth = jnp.full((1, 32, 64, 1), 3.0)
    disp = dtheta_vertical(g, depth, baseline=0.3)
    back = disparity_to_depth_vertical(g, disp, baseline=0.3)
    interior = np.asarray(back)[0, 4:-4]
    np.testing.assert_allclose(interior, 3.0, rtol=1e-4)


def test_throughput_counter():
    t = Throughput(window=10)
    assert t.per_sec == 0.0
    for _ in range(5):
        t.update(2)
    assert t.per_sec > 0


def test_remat_trunk_matches_plain():
    import jax

    from omnifusion_tpu.models.spherical_fusion import DepthTrunk

    patches = jnp.asarray(
        np.random.default_rng(0).random((1, 18, 16, 16, 3), np.float32)
    )
    pf = jnp.zeros((1, 18, 4, 4, 64))
    plain = DepthTrunk()
    variables = plain.init(jax.random.PRNGKey(0), patches, pf)
    a = plain.apply(variables, patches, pf, train=False)
    b = DepthTrunk(remat=True).apply(variables, patches, pf, train=False)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)

    # gradients flow through the remat path
    def loss(p):
        x, _ = DepthTrunk(remat=True).apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, patches, pf, train=False
        )
        return jnp.sum(x**2)

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(float(jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), g, 0.0)))


def test_dataset_shard(tmp_path):
    lines = [f"rgb_{i}.png depth_{i}.png" for i in range(10)]
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    from omnifusion_tpu.data import StanfordDataset

    full = StanfordDataset(str(tmp_path), str(tmp_path / "list.txt"))
    part = StanfordDataset(str(tmp_path), str(tmp_path / "list.txt"), shard=(1, 4))
    assert len(full) == 10
    assert len(part) == 3  # indices 1, 5, 9
    assert part.image_list[0][0] == "rgb_1.png"
