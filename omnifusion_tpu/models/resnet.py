"""ResNet-34 encoder, NHWC, patch axis folded into batch.

The reference mechanically converts torchvision resnet34 to Conv3d with
(k, k, 1) kernels so the tangent-patch axis rides as a third spatial dim
(model/spherical_model.py:122-167).  On TPU that trick is unnecessary: a
plain 2D ResNet over a (batch*patch, h, w, c) tensor is the same computation
as one big batched conv, which is exactly what the MXU wants.  BatchNorm over
the folded batch normalizes across (batch, patch, h, w) — identical statistic
set to the reference's BatchNorm3d.

Module/parameter naming intentionally mirrors the torch layout
(conv1/bn1/layer{1..4}.{i}.conv{1,2}/bn{1,2}/downsample) so the torch
checkpoint importer is a pure name/axis mapping.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from omnifusion_tpu.models.layers import TorchBatchNorm, max_pool_3x3_s2, torch_conv


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 conv-bn-relu, 3x3 conv-bn, residual, relu."""

    features: int
    stride: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = torch_conv(self.features, 3, self.stride, 1, dtype=self.dtype, name="conv1")(x)
        out = TorchBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(
            out, use_running_average=not train
        )
        out = nn.relu(out)
        out = torch_conv(self.features, 3, 1, 1, dtype=self.dtype, name="conv2")(out)
        out = TorchBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn2")(
            out, use_running_average=not train
        )
        if self.downsample:
            identity = torch_conv(
                self.features, 1, self.stride, 0, dtype=self.dtype, name="downsample_conv"
            )(x)
            identity = TorchBatchNorm(
                axis_name=self.axis_name, dtype=self.dtype, name="downsample_bn"
            )(identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    features: int
    num_blocks: int
    stride: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = BasicBlock(
                self.features,
                stride=self.stride if i == 0 else 1,
                downsample=(i == 0 and (self.stride != 1 or x.shape[-1] != self.features)),
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=str(i),
            )(x, train=train)
        return x


RESNET34_STAGES: Sequence[tuple[int, int, int]] = (
    (64, 3, 1),
    (128, 4, 2),
    (256, 6, 2),
    (512, 3, 2),
)


class ResNet34Encoder(nn.Module):
    """Stem + 4 stages; returns the multi-scale feature pyramid.

    Input (N, H, W, 3) -> features:
      conv1:  (N, H/2,  W/2,  64)
      layer1: (N, H/4,  W/4,  64)   (after 3x3/2 maxpool)
      layer2: (N, H/8,  W/8,  128)
      layer3: (N, H/16, W/16, 256)
      layer4: (N, H/32, W/32, 512)
    """

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # (features, blocks, stride) per stage; override to shrink the trunk for
    # compile-time-bounded smoke/dryrun paths (same pyramid, fewer blocks)
    stages: Sequence[tuple[int, int, int]] = RESNET34_STAGES

    @nn.compact
    def __call__(self, x, train: bool = False, extra_layer1_features=None):
        feats = {}
        x = torch_conv(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train
        )
        x = nn.relu(x)
        feats["conv1"] = x
        x = max_pool_3x3_s2(x)
        for i, (features, blocks, stride) in enumerate(self.stages, start=1):
            x = ResNetStage(
                features,
                blocks,
                stride,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, train=train)
            if i == 1 and extra_layer1_features is not None:
                # geometric point features added to layer1
                # (model/spherical_model.py:257-258)
                x = x + extra_layer1_features
            feats[f"layer{i}"] = x
        return feats
