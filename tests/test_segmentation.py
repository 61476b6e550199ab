import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omnifusion_tpu.models import SphericalFusionSeg, cross_entropy_ignore
from omnifusion_tpu.projection import ProjectionSpec

TINY = ProjectionSpec.create((64, 128), (16, 16), (80, 80), nrows=4)


def test_seg_forward_shapes():
    model = SphericalFusionSeg(spec=TINY, num_classes=13)
    rgb = jnp.asarray(np.random.default_rng(0).random((1, 64, 128, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb)
    logits = model.apply(variables, rgb, train=False)
    assert logits.shape == (1, 64, 128, 13)
    assert bool(jnp.isfinite(logits).all())


def test_cross_entropy_ignore_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(-1, 5, (2, 8, 8))
    ours = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(
        F.cross_entropy(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels),
            ignore_index=-1,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_seg_training_step_decreases_loss():
    from omnifusion_tpu.training import create_train_state, make_optimizer

    model = SphericalFusionSeg(spec=TINY, num_classes=5)
    rng = np.random.default_rng(2)
    rgb = jnp.asarray(rng.random((2, 64, 128, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (2, 64, 128)))
    tx = make_optimizer(lr=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), rgb, tx)

    @jax.jit
    def step(state, rgb, labels):
        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgb,
                train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_ignore(logits, labels), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, stats), loss

    losses = []
    for _ in range(4):
        state, loss = step(state, rgb, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
