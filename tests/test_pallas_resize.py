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


def test_model_resize_impl_decoupled_from_kernel_impl(monkeypatch):
    # kernel_impl="pallas" must NOT route the decoder resizes to the pallas
    # stencil: the on-chip shootout measured it at 48.7 ms vs XLA's 15.3 ms
    # for the 5 decoder stages at the flagship batch (measurements.log
    # 2026-08-19 resize_shootout), so the composed pallas mode ships the
    # faster XLA resize and the stencil is the explicit resize_impl opt-in.
    import numpy as np
    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.ops import pallas_resize
    from omnifusion_tpu.projection import ProjectionSpec

    spec = ProjectionSpec.create((64, 128), (16, 16), (80, 80), nrows=4)
    rgb = jnp.asarray(
        np.random.default_rng(3).random((1, 64, 128, 3), dtype=np.float32)
    )
    kw = dict(
        spec=spec,
        depth=2,
        encoder_stages=((64, 1, 1), (128, 1, 2), (256, 1, 2), (512, 1, 2)),
    )

    calls = []
    real = pallas_resize.upsample2x_bilinear

    def counted(x, interpret=None):
        calls.append(x.shape)
        return real(x, interpret)

    monkeypatch.setattr(pallas_resize, "upsample2x_bilinear", counted)

    m = SphericalFusion(**kw, kernel_impl="pallas")
    variables = m.init(jax.random.PRNGKey(0), rgb)
    m.apply(variables, rgb, train=False)
    assert not calls, f"pallas resize reached under kernel_impl='pallas': {calls}"

    SphericalFusion(**kw, resize_impl="pallas").apply(variables, rgb, train=False)
    assert calls, "resize_impl='pallas' did not route to the stencil kernel"
