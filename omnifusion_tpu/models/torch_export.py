"""Export flax variables to reference-format torch state dicts.

The exact inverse of torch_import: produces the key names and tensor layouts
of the reference's checkpoints (Conv3d (k,k,1) kernels, Linear (out,in),
Sequential-indexed mlp_points), so models trained here can be loaded by the
upstream PyTorch code — and so the end-to-end parity test can instantiate
the upstream network with our weights.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
from flax import traverse_util


def _conv_w(kernel: np.ndarray, conv3d: bool = True) -> np.ndarray:
    """(kh, kw, I, O) -> (O, I, kh, kw[, 1])."""
    w = np.transpose(np.asarray(kernel), (3, 2, 0, 1))
    return w[..., None] if conv3d else w


def _linear_w(kernel: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(kernel), (1, 0))


def _export_bn(sd, name, params, stats):
    sd[f"{name}.weight"] = np.asarray(params["scale"])
    sd[f"{name}.bias"] = np.asarray(params["bias"])
    sd[f"{name}.running_mean"] = np.asarray(stats["mean"])
    sd[f"{name}.running_var"] = np.asarray(stats["var"])
    sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def _export_encoder(sd, p, s):
    sd["conv1.weight"] = _conv_w(p["conv1"]["kernel"])
    _export_bn(sd, "bn1", p["bn1"], s["bn1"])
    from omnifusion_tpu.models.torch_import import RESNET34_BLOCKS

    for stage, blocks in enumerate(RESNET34_BLOCKS, start=1):
        for b in range(blocks):
            bp = p[f"layer{stage}"][str(b)]
            bs = s[f"layer{stage}"][str(b)]
            t = f"layer{stage}.{b}"
            sd[f"{t}.conv1.weight"] = _conv_w(bp["conv1"]["kernel"])
            _export_bn(sd, f"{t}.bn1", bp["bn1"], bs["bn1"])
            sd[f"{t}.conv2.weight"] = _conv_w(bp["conv2"]["kernel"])
            _export_bn(sd, f"{t}.bn2", bp["bn2"], bs["bn2"])
            if "downsample_conv" in bp:
                sd[f"{t}.downsample.0.weight"] = _conv_w(bp["downsample_conv"]["kernel"])
                _export_bn(sd, f"{t}.downsample.1", bp["downsample_bn"], bs["downsample_bn"])


def _export_mlp_points(sd, prefix, p, s):
    sd[f"{prefix}.0.weight"] = _conv_w(p["conv1"]["kernel"], conv3d=False)
    _export_bn(sd, f"{prefix}.1", p["bn1"], s["bn1"])
    sd[f"{prefix}.3.weight"] = _conv_w(p["conv2"]["kernel"], conv3d=False)
    _export_bn(sd, f"{prefix}.4", p["bn2"], s["bn2"])


def _export_trunk(sd, p, s, down_name="down"):
    _export_encoder(sd, p["encoder"], s["encoder"])
    sd[f"{down_name}.weight"] = _conv_w(p["down"]["kernel"])
    sd[f"{down_name}.bias"] = np.asarray(p["down"]["bias"])

    tp = p["transformer"]
    sd["transformer.pos_emb"] = np.asarray(tp["pos_emb"])
    sd["transformer.encoder_norm.weight"] = np.asarray(tp["encoder_norm"]["scale"])
    sd["transformer.encoder_norm.bias"] = np.asarray(tp["encoder_norm"]["bias"])
    i = 0
    while f"layer_{i}" in tp:
        lp = tp[f"layer_{i}"]
        t = f"transformer.layer.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{t}.{norm}.weight"] = np.asarray(lp[norm]["scale"])
            sd[f"{t}.{norm}.bias"] = np.asarray(lp[norm]["bias"])
        sd[f"{t}.attn.q.weight"] = _linear_w(lp["attn"]["q"]["kernel"])
        sd[f"{t}.attn.kv.weight"] = _linear_w(lp["attn"]["kv"]["kernel"])
        sd[f"{t}.attn.proj.weight"] = _linear_w(lp["attn"]["proj"]["kernel"])
        sd[f"{t}.attn.proj.bias"] = np.asarray(lp["attn"]["proj"]["bias"])
        sd[f"{t}.mlp.fc1.weight"] = _linear_w(lp["mlp"]["fc1"]["kernel"])
        sd[f"{t}.mlp.fc1.bias"] = np.asarray(lp["mlp"]["fc1"]["bias"])
        sd[f"{t}.mlp.fc2.weight"] = _linear_w(lp["mlp"]["fc2"]["kernel"])
        sd[f"{t}.mlp.fc2.bias"] = np.asarray(lp["mlp"]["fc2"]["bias"])
        i += 1

    for stage in ("0_0", "0_1", "1_0", "1_1", "2_0", "2_1", "3_0", "3_1", "4_0"):
        t = f"de_conv{stage}"
        sd[f"{t}.conv.weight"] = _conv_w(p[t]["conv"]["kernel"])
        _export_bn(sd, f"{t}.bn", p[t]["bn"], s[t]["bn"])
    for head in ("pred", "weight_pred"):
        sd[f"{head}.weight"] = _conv_w(p[head]["kernel"])
        sd[f"{head}.bias"] = np.asarray(p[head]["bias"])


def export_oneshot_checkpoint(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """SphericalFusion variables -> reference spherical_model state dict."""
    p, s = variables["params"], variables["batch_stats"]
    sd: dict = {}
    _export_trunk(sd, p["trunk"], s["trunk"], "down")
    _export_mlp_points(sd, "mlp_points", p["mlp_points"], s["mlp_points"])
    return sd


def export_iterative_checkpoint(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """SphericalFusionIterative variables -> reference state dict."""
    p, s = variables["params"], variables["batch_stats"]
    sd: dict = {}
    _export_trunk(sd, p["trunk"], s["trunk"], "down1")
    _export_mlp_points(sd, "mlp_points1", p["mlp_points1"], s["mlp_points1"])
    _export_mlp_points(sd, "mlp_points2", p["mlp_points2"], s["mlp_points2"])
    return sd


def save_torch_checkpoint(path: str, sd: Mapping[str, np.ndarray]):
    """Write a torch-loadable .pth file."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
