"""Tests for datasets, loader, and utils (colorize/ply/iou)."""

import numpy as np
import pytest

from omnifusion_tpu.data import DataLoader, StanfordDataset, SyntheticDataset, make_dataset
from omnifusion_tpu.utils import colorize, confusion_matrix, evaluate_iou, ply


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(size=10, pano_h=64, pano_w=128)
    rgb, depth, mask = ds[0]
    assert rgb.shape == (64, 128, 3) and depth.shape == (64, 128, 1)
    assert mask.min() >= 0 and mask.max() <= 1
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["rgb"].shape == (4, 64, 128, 3)
    assert batches[0]["depth"].dtype == np.float32


def test_stanford_dataset_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    rgb = (rng.random((256, 512, 3)) * 255).astype(np.uint8)
    depth_m = rng.random((256, 512)) * 7 + 0.5  # meters
    depth_png = (depth_m / 128 * 65535).astype(np.uint16)
    cv2.imwrite(str(tmp_path / "rgb.png"), rgb)
    cv2.imwrite(str(tmp_path / "depth.png"), depth_png)
    (tmp_path / "list.txt").write_text("/rgb.png /depth.png\n")

    ds = StanfordDataset(str(tmp_path), str(tmp_path / "list.txt"))
    assert len(ds) == 1
    r, d, m = ds[0]
    assert r.shape == (512, 1024, 3) and d.shape == (512, 1024, 1)
    assert 0 <= r.min() and r.max() <= 1
    # depth decoded back to meters (within resize + uint16 quantization)
    valid = m > 0
    assert valid.mean() > 0.9
    assert abs(d[valid].mean() - depth_m.mean()) < 0.2


def test_dataset_augmentations_deterministic_seed(tmp_path):
    ds1 = SyntheticDataset(size=4, seed=7)
    ds2 = SyntheticDataset(size=4, seed=7)
    a, b = ds1[2], ds2[2]
    np.testing.assert_array_equal(a[0], b[0])


def test_make_dataset_dispatch():
    assert isinstance(make_dataset("synthetic", size=2), SyntheticDataset)
    with pytest.raises(ValueError, match="unknown dataset"):
        make_dataset("nope")


def test_colorize():
    img = colorize(np.linspace(0, 1, 64).reshape(8, 8))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    flat = colorize(np.zeros((4, 4)))  # vmin == vmax path
    assert flat.shape == (4, 4, 3)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.random((100, 3)).astype(np.float32)
    colors = (rng.random((100, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    assert ply.write_ply(path, [pts, colors], ["x", "y", "z", "red", "green", "blue"])
    data = ply.read_ply(path)
    np.testing.assert_allclose(
        np.stack([data["x"], data["y"], data["z"]], -1), pts, atol=1e-7
    )
    np.testing.assert_array_equal(data["red"], colors[:, 0])


def test_depth_to_pointcloud():
    depth = np.full((8, 16, 1), 2.0, np.float32)
    xyz = ply.depth_to_pointcloud(depth)
    assert xyz.shape == (128, 3)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), 2.0, atol=1e-5)


def test_iou():
    gt = np.array([0, 0, 1, 1, 2, -1])
    pred = np.array([0, 1, 1, 1, 0, 2])
    cm = confusion_matrix(pred, gt, 3)
    assert cm.sum() == 5  # ignore label dropped
    miou, ious = evaluate_iou([pred], [gt], 3)
    np.testing.assert_allclose(ious[1], 2 / 3)
    assert 0 <= miou <= 1
