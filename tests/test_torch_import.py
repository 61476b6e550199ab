"""Checkpoint importer tests.

A synthetic state dict with the reference's exact key names and tensor
shapes (train_erp_depth.py:307 checkpoints, DataParallel 'module.' prefixes)
is built here independently of the importer's own mapping tables, imported,
and checked against the model's init structure.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from omnifusion_tpu.models import SphericalFusion, SphericalFusionIterative
from omnifusion_tpu.models.torch_import import (
    import_iterative_checkpoint,
    import_oneshot_checkpoint,
    import_torchvision_resnet34,
    merge_pretrained,
)
from omnifusion_tpu.projection import ProjectionSpec


def _bn(sd, name, c, rng):
    sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{name}.running_var"] = rng.random(c).astype(np.float32) + 0.5
    sd[f"{name}.num_batches_tracked"] = np.array(100)


def _conv3d(sd, name, o, i, k, rng, bias=False):
    sd[f"{name}.weight"] = (rng.standard_normal((o, i, k, k, 1)) * 0.05).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)


def _conv2d(sd, name, o, i, k, rng):
    sd[f"{name}.weight"] = (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)


def _linear(sd, name, o, i, rng, bias=True):
    sd[f"{name}.weight"] = (rng.standard_normal((o, i)) * 0.05).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)


def _resnet34_encoder_sd(sd, rng, conv3d=True):
    mk = _conv3d if conv3d else (lambda s, n, o, i, k, r: _conv2d(s, n, o, i, k, r))
    mk(sd, "conv1", 64, 3, 7, rng)
    _bn(sd, "bn1", 64, rng)
    chans = [64, 128, 256, 512]
    blocks = [3, 4, 6, 3]
    prev = 64
    for s, (c, nb) in enumerate(zip(chans, blocks), start=1):
        for b in range(nb):
            name = f"layer{s}.{b}"
            mk(sd, f"{name}.conv1", c, prev if b == 0 else c, 3, rng)
            _bn(sd, f"{name}.bn1", c, rng)
            mk(sd, f"{name}.conv2", c, c, 3, rng)
            _bn(sd, f"{name}.bn2", c, rng)
            if b == 0 and prev != c:
                mk(sd, f"{name}.downsample.0", c, prev, 1, rng)
                _bn(sd, f"{name}.downsample.1", c, rng)
        prev = c


def _trunk_sd(sd, rng, down_name="down", n_patch=18, emb=512):
    _resnet34_encoder_sd(sd, rng)
    _conv3d(sd, down_name, 32, 512, 1, rng, bias=True)
    sd["transformer.pos_emb"] = (rng.standard_normal((1, n_patch, emb)) * 0.02).astype(
        np.float32
    )
    sd["transformer.encoder_norm.weight"] = np.ones(emb, np.float32)
    sd["transformer.encoder_norm.bias"] = np.zeros(emb, np.float32)
    for i in range(6):
        t = f"transformer.layer.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{t}.{norm}.weight"] = np.ones(emb, np.float32)
            sd[f"{t}.{norm}.bias"] = np.zeros(emb, np.float32)
        _linear(sd, f"{t}.attn.q", emb, emb, rng, bias=False)
        _linear(sd, f"{t}.attn.kv", 2 * emb, emb, rng, bias=False)
        _linear(sd, f"{t}.attn.proj", emb, emb, rng)
        _linear(sd, f"{t}.mlp.fc1", 4 * emb, emb, rng)
        _linear(sd, f"{t}.mlp.fc2", emb, 4 * emb, rng)
    dec = [
        ("de_conv0_0", 256, 512),
        ("de_conv0_1", 128, 512),
        ("de_conv1_0", 128, 128),
        ("de_conv1_1", 64, 256),
        ("de_conv2_0", 64, 64),
        ("de_conv2_1", 64, 128),
        ("de_conv3_0", 64, 64),
        ("de_conv3_1", 32, 128),
        ("de_conv4_0", 32, 32),
    ]
    for name, o, i in dec:
        _conv3d(sd, f"{name}.conv", o, i, 3, rng)
        _bn(sd, f"{name}.bn", o, rng)
    _conv3d(sd, "pred", 1, 32, 3, rng, bias=True)
    _conv3d(sd, "weight_pred", 1, 32, 3, rng, bias=True)


def _mlp_points_sd(sd, prefix, in_ch, rng):
    _conv2d(sd, f"{prefix}.0", 16, in_ch, 1, rng)
    _bn(sd, f"{prefix}.1", 16, rng)
    _conv2d(sd, f"{prefix}.3", 64, 16, 1, rng)
    _bn(sd, f"{prefix}.4", 64, rng)


def _tree_shapes(tree):
    return {k: tuple(v.shape) for k, v in traverse_util.flatten_dict(tree).items()}


SPEC128 = ProjectionSpec.create((256, 512), (128, 128), (80, 80), nrows=4)


def test_oneshot_import_structure_and_forward():
    rng = np.random.default_rng(0)
    sd = {}
    _trunk_sd(sd, rng, "down")
    _mlp_points_sd(sd, "mlp_points", 5, rng)
    # DataParallel prefix, as saved by the reference trainers
    sd = {f"module.{k}": v for k, v in sd.items()}

    variables = import_oneshot_checkpoint(sd)

    model = SphericalFusion(spec=SPEC128)
    ref_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)))
    )
    assert _tree_shapes(variables) == _tree_shapes(ref_shapes)

    # spot-check a couple of value mappings
    np.testing.assert_allclose(
        np.asarray(variables["params"]["trunk"]["encoder"]["conv1"]["kernel"]),
        sd["module.conv1.weight"][..., 0].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(
            variables["params"]["trunk"]["transformer"]["layer_3"]["attn"]["q"]["kernel"]
        ),
        sd["module.transformer.layer.3.attn.q.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mlp_points"]["bn2"]["var"]),
        sd["module.mlp_points.4.running_var"],
    )

    depth = model.apply(variables, jnp.ones((1, 256, 512, 3)), train=False)
    assert depth.shape == (1, 256, 512, 1)
    assert bool(jnp.isfinite(depth).all())


def test_iterative_import_structure():
    rng = np.random.default_rng(1)
    sd = {}
    _trunk_sd(sd, rng, "down1")
    _mlp_points_sd(sd, "mlp_points1", 3, rng)
    _mlp_points_sd(sd, "mlp_points2", 3, rng)

    variables = import_iterative_checkpoint(sd)
    model = SphericalFusionIterative(spec=SPEC128, num_iters=2)
    ref_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)))
    )
    assert _tree_shapes(variables) == _tree_shapes(ref_shapes)


def test_torchvision_resnet_import_merges():
    rng = np.random.default_rng(2)
    sd = {}
    _resnet34_encoder_sd(sd, rng, conv3d=False)  # plain 2D torchvision layout
    pretrained = import_torchvision_resnet34(sd)

    model = SphericalFusion(spec=SPEC128)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)))
    )
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    merged = merge_pretrained(variables, pretrained)
    got = np.asarray(merged["params"]["trunk"]["encoder"]["layer2"]["0"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, sd["layer2.0.conv1.weight"].transpose(2, 3, 1, 0))


def test_merge_pretrained_shape_mismatch_raises():
    variables = {"params": {"a": jnp.zeros((2, 2))}}
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_pretrained(variables, {"params": {"a": jnp.zeros((3, 3))}})
