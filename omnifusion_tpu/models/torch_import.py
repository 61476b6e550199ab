"""Torch checkpoint importer.

Maps reference checkpoints (state dicts saved by train_erp_depth.py:307 /
test.py:108) onto our flax variable tree:

  - strips the DataParallel ``module.`` prefix;
  - collapses the reference's Conv3d (k, k, 1) kernels (created by
    convert_conv, model/spherical_model.py:122-143) back to 2D and
    transposes (O, I, kh, kw) -> (kh, kw, I, O);
  - transposes Linear weights (out, in) -> (in, out);
  - BatchNorm weight/bias/running_mean/running_var ->
    params.scale/params.bias/batch_stats.mean/batch_stats.var
    (num_batches_tracked is dropped);
  - also accepts plain torchvision resnet34 state dicts (2D convs) for
    pretrained-encoder initialization.

Works on numpy arrays; use ``load_torch_state_dict`` to read a .pth file
(requires torch, which is an optional host-side dependency).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp
from flax import traverse_util


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _strip_module_prefix(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v for k, v in sd.items()
    }


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw[, 1]) -> (kh, kw, I, O)."""
    if w.ndim == 5:
        assert w.shape[-1] == 1, w.shape
        w = w[..., 0]
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _put(flat: dict, collection: str, path: tuple, value: np.ndarray):
    flat[(collection,) + path] = jnp.asarray(np.ascontiguousarray(value))


def _import_bn(flat, torch_sd, torch_name, path):
    _put(flat, "params", path + ("scale",), torch_sd[f"{torch_name}.weight"])
    _put(flat, "params", path + ("bias",), torch_sd[f"{torch_name}.bias"])
    _put(flat, "batch_stats", path + ("mean",), torch_sd[f"{torch_name}.running_mean"])
    _put(flat, "batch_stats", path + ("var",), torch_sd[f"{torch_name}.running_var"])


def _import_conv(flat, torch_sd, torch_name, path, bias: bool = False):
    _put(flat, "params", path + ("kernel",), _conv_kernel(torch_sd[f"{torch_name}.weight"]))
    if bias and f"{torch_name}.bias" in torch_sd:
        _put(flat, "params", path + ("bias",), torch_sd[f"{torch_name}.bias"])


def _import_linear(flat, torch_sd, torch_name, path):
    _put(flat, "params", path + ("kernel",), _linear_kernel(torch_sd[f"{torch_name}.weight"]))
    if f"{torch_name}.bias" in torch_sd:
        _put(flat, "params", path + ("bias",), torch_sd[f"{torch_name}.bias"])


RESNET34_BLOCKS = (3, 4, 6, 3)


def _import_resnet_encoder(flat, sd, prefix: str, path: tuple):
    """conv1/bn1/layer1..4 of a (possibly Conv3d-converted) resnet34."""
    _import_conv(flat, sd, f"{prefix}conv1", path + ("conv1",))
    _import_bn(flat, sd, f"{prefix}bn1", path + ("bn1",))
    for stage, blocks in enumerate(RESNET34_BLOCKS, start=1):
        for b in range(blocks):
            t = f"{prefix}layer{stage}.{b}"
            p = path + (f"layer{stage}", str(b))
            _import_conv(flat, sd, f"{t}.conv1", p + ("conv1",))
            _import_bn(flat, sd, f"{t}.bn1", p + ("bn1",))
            _import_conv(flat, sd, f"{t}.conv2", p + ("conv2",))
            _import_bn(flat, sd, f"{t}.bn2", p + ("bn2",))
            if f"{t}.downsample.0.weight" in sd:
                _import_conv(flat, sd, f"{t}.downsample.0", p + ("downsample_conv",))
                _import_bn(flat, sd, f"{t}.downsample.1", p + ("downsample_bn",))


def _import_mlp_points(flat, sd, prefix: str, path: tuple):
    """nn.Sequential(conv, bn, relu, conv, bn, relu) -> conv1/bn1/conv2/bn2."""
    _import_conv(flat, sd, f"{prefix}.0", path + ("conv1",))
    _import_bn(flat, sd, f"{prefix}.1", path + ("bn1",))
    _import_conv(flat, sd, f"{prefix}.3", path + ("conv2",))
    _import_bn(flat, sd, f"{prefix}.4", path + ("bn2",))


def _import_trunk(flat, sd, down_name: str, trunk: tuple, n_layers: int = 6):
    _import_resnet_encoder(flat, sd, "", trunk + ("encoder",))
    _import_conv(flat, sd, down_name, trunk + ("down",), bias=True)

    tp = trunk + ("transformer",)
    _put(flat, "params", tp + ("pos_emb",), sd["transformer.pos_emb"])
    _put(flat, "params", tp + ("encoder_norm", "scale"), sd["transformer.encoder_norm.weight"])
    _put(flat, "params", tp + ("encoder_norm", "bias"), sd["transformer.encoder_norm.bias"])
    for i in range(n_layers):
        t = f"transformer.layer.{i}"
        p = tp + (f"layer_{i}",)
        for norm in ("norm1", "norm2"):
            _put(flat, "params", p + (norm, "scale"), sd[f"{t}.{norm}.weight"])
            _put(flat, "params", p + (norm, "bias"), sd[f"{t}.{norm}.bias"])
        _import_linear(flat, sd, f"{t}.attn.q", p + ("attn", "q"))
        _import_linear(flat, sd, f"{t}.attn.kv", p + ("attn", "kv"))
        _import_linear(flat, sd, f"{t}.attn.proj", p + ("attn", "proj"))
        _import_linear(flat, sd, f"{t}.mlp.fc1", p + ("mlp", "fc1"))
        _import_linear(flat, sd, f"{t}.mlp.fc2", p + ("mlp", "fc2"))

    for stage in ("0_0", "0_1", "1_0", "1_1", "2_0", "2_1", "3_0", "3_1", "4_0"):
        t = f"de_conv{stage}"
        _import_conv(flat, sd, f"{t}.conv", trunk + (t, "conv"))
        _import_bn(flat, sd, f"{t}.bn", trunk + (t, "bn"))
    _import_conv(flat, sd, "pred", trunk + ("pred",), bias=True)
    _import_conv(flat, sd, "weight_pred", trunk + ("weight_pred",), bias=True)


def _unflatten(flat: dict) -> dict[str, Any]:
    tree = traverse_util.unflatten_dict(flat)
    return {k: tree[k] for k in tree}


def import_oneshot_checkpoint(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Reference one-shot spherical_fusion state dict -> flax variables."""
    sd = _strip_module_prefix(sd)
    flat: dict = {}
    _import_trunk(flat, sd, "down", ("trunk",))
    _import_mlp_points(flat, sd, "mlp_points", ("mlp_points",))
    return _unflatten(flat)


def import_iterative_checkpoint(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Reference iterative spherical_fusion state dict -> flax variables."""
    sd = _strip_module_prefix(sd)
    flat: dict = {}
    _import_trunk(flat, sd, "down1", ("trunk",))
    _import_mlp_points(flat, sd, "mlp_points1", ("mlp_points1",))
    _import_mlp_points(flat, sd, "mlp_points2", ("mlp_points2",))
    return _unflatten(flat)


def import_torchvision_resnet34(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """torchvision resnet34 state dict -> encoder-only flax variables
    (for pretrained initialization of the trunk encoder)."""
    sd = _strip_module_prefix(sd)
    flat: dict = {}
    _import_resnet_encoder(flat, sd, "", ("trunk", "encoder"))
    return _unflatten(flat)


def merge_pretrained(variables: dict, pretrained: dict) -> dict:
    """Overlay imported (partial) variables onto freshly initialized ones.

    The reference's load_partial_model equivalent (util.py:114-120): entries
    present in ``pretrained`` replace those in ``variables``; everything else
    is kept.  Raises on shape mismatch.
    """
    flat_v = traverse_util.flatten_dict(variables)
    flat_p = traverse_util.flatten_dict(pretrained)
    for k, v in flat_p.items():
        if k in flat_v:
            if tuple(flat_v[k].shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch at {k}: {flat_v[k].shape} vs {v.shape}")
            flat_v[k] = v
    return traverse_util.unflatten_dict(flat_v)
