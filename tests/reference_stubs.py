"""Stub modules that let the upstream reference model import in this image.

The reference's model/blocks.py imports timm/mmseg/mmcv symbols that are
unused at runtime (SURVEY.md §2.2), and spherical_model.py needs
torchvision.models.resnet34.  None of those packages exist here, so this
installs minimal stand-ins into sys.modules — including a standard ResNet-34
definition with torchvision's parameter naming (public, well-known
architecture; weights are never downloaded).

FOR TESTS ONLY: lets tests/test_reference_parity.py run the actual upstream
network with our exported weights.
"""

from __future__ import annotations

import sys
import types


def _resnet34_module():
    import torch.nn as nn

    def conv3x3(inp, out, stride=1):
        return nn.Conv2d(inp, out, 3, stride=stride, padding=1, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], 2)
            self.layer3 = self._make_layer(block, 256, layers[2], 2)
            self.layer4 = self._make_layer(block, 512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, 1000)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes),
                )
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            layers += [block(planes, planes) for _ in range(1, blocks)]
            return nn.Sequential(*layers)

    def resnet34(pretrained=False, **kw):
        return ResNet(BasicBlock, [3, 4, 6, 3])

    mod = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.resnet34 = resnet34
    mod.models = models
    return mod, models


def install_stubs():
    import torch.nn as nn
    from torch.nn.init import trunc_normal_

    if "torchvision" not in sys.modules:
        tv, tv_models = _resnet34_module()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = lambda fn=None, **kw: fn if fn else (lambda f: f)
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit._cfg = lambda **kw: kw
    for name, mod in [
        ("timm", timm),
        ("timm.models", timm_models),
        ("timm.models.layers", timm_layers),
        ("timm.models.registry", timm_registry),
        ("timm.models.vision_transformer", timm_vit),
    ]:
        sys.modules.setdefault(name, mod)

    mmseg = types.ModuleType("mmseg")
    mmseg_utils = types.ModuleType("mmseg.utils")
    mmseg_utils.get_root_logger = lambda *a, **k: None
    mmcv = types.ModuleType("mmcv")
    mmcv_runner = types.ModuleType("mmcv.runner")
    mmcv_runner.load_checkpoint = lambda *a, **k: None
    for name, mod in [
        ("mmseg", mmseg),
        ("mmseg.utils", mmseg_utils),
        ("mmcv", mmcv),
        ("mmcv.runner", mmcv_runner),
    ]:
        sys.modules.setdefault(name, mod)
