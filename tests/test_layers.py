"""Component-level parity of NN primitives against torch semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omnifusion_tpu.models.layers import (
    TorchBatchNorm,
    max_pool_3x3_s2,
    resize_bilinear,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_batchnorm_train_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 5, 6, 3)).astype(np.float32)

    bn = TorchBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    # run two training steps to exercise the running-stat update
    stats = variables["batch_stats"]
    for _ in range(2):
        y, mut = bn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x),
            use_running_average=False,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]

    t_bn = torch.nn.BatchNorm2d(3)
    t_x = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for _ in range(2):
            t_y = t_bn(t_x)

    np.testing.assert_allclose(
        np.asarray(y), t_y.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), t_bn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), t_bn.running_var.numpy(), atol=1e-5
    )


def test_batchnorm_eval_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    mean = rng.standard_normal(3).astype(np.float32)
    var = rng.random(3).astype(np.float32) + 0.5
    scale = rng.standard_normal(3).astype(np.float32)
    bias = rng.standard_normal(3).astype(np.float32)

    bn = TorchBatchNorm()
    y = bn.apply(
        {
            "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
            "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        },
        jnp.asarray(x),
        use_running_average=True,
    )
    t_y = F.batch_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(mean),
        torch.from_numpy(var),
        torch.from_numpy(scale),
        torch.from_numpy(bias),
        training=False,
    )
    np.testing.assert_allclose(
        np.asarray(y), t_y.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_batchnorm_sync_across_axis():
    """pmean-synced stats equal the full-batch stats (SyncBN semantics)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 4, 4, 3)).astype(np.float32)
    bn = TorchBatchNorm(axis_name="d")
    # init in eval mode: the pmean'd train path needs the mapped axis bound
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), use_running_average=True)

    def fwd(xs):
        y, mut = bn.apply(
            variables, xs, use_running_average=False, mutable=["batch_stats"]
        )
        return y, mut["batch_stats"]

    y_sync, stats_sync = jax.vmap(fwd, axis_name="d")(
        jnp.asarray(x).reshape(4, 2, 4, 4, 3)
    )
    # reference: plain (unsynced) BN over the full batch at once
    y_full, mut_full = TorchBatchNorm().apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(y_sync).reshape(8, 4, 4, 3), np.asarray(y_full), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sync["mean"][0]),
        np.asarray(mut_full["batch_stats"]["mean"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stats_sync["var"][0]),
        np.asarray(mut_full["batch_stats"]["var"]),
        atol=1e-5,
    )


def test_maxpool_matches_torch():
    rng = np.random.default_rng(3)
    for h, w in [(8, 8), (7, 9), (16, 32)]:
        x = rng.standard_normal((2, h, w, 4)).astype(np.float32)
        ours = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
        theirs = F.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=2, padding=1
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=0)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    for size in [(16, 24), (15, 23), (32, 48)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        theirs = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=size,
            mode="bilinear",
            align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_2x_impls_match_xla():
    """stencil / conv exact-2x reformulations (train-backward layout probe)
    must match jax.image.resize in value AND gradient."""
    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32))
    ref = resize_bilinear(x, (16, 24), impl="xla")
    g_ref = jax.grad(lambda z: (resize_bilinear(z, (16, 24), impl="xla") ** 2).sum())(x)
    for impl in ("stencil", "conv"):
        got = resize_bilinear(x, (16, 24), impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
        g = jax.grad(
            lambda z, _i=impl: (resize_bilinear(z, (16, 24), impl=_i) ** 2).sum()
        )(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
        # non-2x targets fall back to jax.image.resize
        assert resize_bilinear(x, (15, 23), impl=impl).shape == (2, 15, 23, 3)


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    import flax.linen as nn

    ours = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
    theirs = F.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_conv_padding_matches_torch():
    from omnifusion_tpu.models.layers import torch_conv

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 9, 9, 2)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, 2, 4)).astype(np.float32) * 0.1
    conv = torch_conv(4, 3, 2, 1)
    y = conv.apply({"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x))
    t_y = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(kernel.transpose(3, 2, 0, 1)),
        stride=2,
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), t_y, atol=1e-5)
