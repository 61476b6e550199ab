"""Tests for chamfer distance, caffe bias rules, legacy no-transformer variant."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omnifusion_tpu.evaluation import chamfer_distance
from omnifusion_tpu.models import SphericalFusion
from omnifusion_tpu.projection import ProjectionSpec
from omnifusion_tpu.training import make_optimizer


def test_chamfer_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p1 = rng.standard_normal((2, 50, 3)).astype(np.float32)
    p2 = rng.standard_normal((2, 70, 3)).astype(np.float32)
    ours = float(chamfer_distance(jnp.asarray(p1), jnp.asarray(p2), block=16))

    # reference math (util.py:201-257): sum over min distances
    t1, t2 = torch.from_numpy(p1), torch.from_numpy(p2)
    dist = torch.cdist(t1, t2)
    theirs = float(dist.min(dim=2)[0].sum())
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_caffe_bias_rules():
    tx = make_optimizer(lr=1e-2, weight_decay=0.5, caffe_bias_rules=True)
    params = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # bias: 2x lr, no weight decay; kernel: 1x lr + decay. With unit grads
    # and params, adam normalizes to ~1, so update magnitudes differ by
    # ~2x (bias) vs (1 + wd)*lr (kernel)
    bias_mag = float(jnp.abs(updates["conv"]["bias"]).mean())
    kernel_mag = float(jnp.abs(updates["conv"]["kernel"]).mean())
    assert bias_mag > kernel_mag  # 2x lr, no decay pull in same direction here
    np.testing.assert_allclose(bias_mag, 2e-2, rtol=1e-3)


def test_no_transformer_variant():
    spec = ProjectionSpec.create((64, 128), (16, 16), (80, 80), nrows=4)
    model = SphericalFusion(spec=spec, use_transformer=False)
    rgb = jnp.ones((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb)
    # no transformer params in the tree
    assert "transformer" not in variables["params"]["trunk"]
    assert "down" not in variables["params"]["trunk"]
    out = model.apply(variables, rgb, train=False)
    assert out.shape == (1, 64, 128, 1)
    assert bool(jnp.isfinite(out).all())


def test_frozen_prefixes():
    tx = make_optimizer(lr=1e-2, frozen_prefixes=("enc",))
    params = {"enc": {"kernel": jnp.ones((2,))}, "head": {"kernel": jnp.ones((2,))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["enc"]["kernel"]), 0.0)
    assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0
