"""Fused 2x bilinear upsample kernel vs jax.image.resize (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from omnifusion_tpu.models.layers import resize_bilinear
from omnifusion_tpu.ops.pallas_resize import upsample2x_bilinear


def test_up2x_matches_jax_image_resize():
    rng = np.random.default_rng(0)
    for shape in [(3, 4, 4, 8), (2, 64, 64, 32), (1, 7, 5, 3)]:
        x = jnp.asarray(rng.random(shape, dtype=np.float32))
        target = (shape[0], 2 * shape[1], 2 * shape[2], shape[3])
        ref = jax.image.resize(x, target, method="bilinear")
        got = upsample2x_bilinear(x, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_up2x_gradient_matches_autodiff():
    x = jnp.asarray(np.random.default_rng(1).random((2, 8, 8, 4), dtype=np.float32))

    def loss_xla(x):
        return (jax.image.resize(x, (2, 16, 16, 4), method="bilinear") ** 3).sum()

    def loss_pallas(x):
        return (upsample2x_bilinear(x, True) ** 3).sum()

    g_ref = jax.grad(loss_xla)(x)
    g_got = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-5)


def test_resize_bilinear_falls_back_for_non_2x():
    # non-2x targets must route to jax.image.resize regardless of impl
    x = jnp.asarray(np.random.default_rng(2).random((2, 8, 8, 4), dtype=np.float32))
    ref = resize_bilinear(x, (12, 20))
    got = resize_bilinear(x, (12, 20), impl="pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
