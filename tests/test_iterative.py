import numpy as np
import jax
import jax.numpy as jnp

from omnifusion_tpu.models import SphericalFusionIterative
from omnifusion_tpu.projection import ProjectionSpec

TINY = ProjectionSpec.create((128, 256), (32, 32), (80, 80), nrows=4)


def test_iterative_forward():
    model = SphericalFusionIterative(spec=TINY, num_iters=2)
    rgb = jnp.asarray(
        np.random.default_rng(0).random((1, 128, 256, 3), dtype=np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), rgb)
    preds = model.apply(variables, rgb, train=False)
    assert len(preds) == 2
    for p in preds:
        assert p.shape == (1, 128, 256, 1)
        assert bool(jnp.isfinite(p).all())
    # iterations share trunk weights but differ through the point features
    assert not np.allclose(np.asarray(preds[0]), np.asarray(preds[1]))


def test_iterative_single_iter_matches_first_pass():
    rgb = jnp.asarray(
        np.random.default_rng(1).random((1, 128, 256, 3), dtype=np.float32)
    )
    m2 = SphericalFusionIterative(spec=TINY, num_iters=2)
    variables = m2.init(jax.random.PRNGKey(0), rgb)
    m1 = SphericalFusionIterative(spec=TINY, num_iters=1)
    p1 = m1.apply(variables, rgb, train=False)
    p2 = m2.apply(variables, rgb, train=False)
    assert len(p1) == 1 and len(p2) == 2
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p2[0]), atol=1e-6)


def test_iterative_confidence_mode():
    model = SphericalFusionIterative(spec=TINY, num_iters=2)
    rgb = jnp.ones((1, 128, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb)
    preds = model.apply(variables, rgb, train=False, confidence=True)
    assert all(bool(jnp.isfinite(p).all()) for p in preds)
