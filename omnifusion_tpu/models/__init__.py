from omnifusion_tpu.models.spherical_fusion import (
    SphericalFusion,
    DepthTrunk,
    MlpPoints,
    confidence_merge,
    MIN_DEPTH,
    MAX_DEPTH,
)
from omnifusion_tpu.models.iterative import SphericalFusionIterative
from omnifusion_tpu.models.segmentation import SphericalFusionSeg, cross_entropy_ignore
from omnifusion_tpu.models.resnet import ResNet34Encoder
from omnifusion_tpu.models.transformer import TransformerCascade

__all__ = [
    "SphericalFusion",
    "SphericalFusionIterative",
    "SphericalFusionSeg",
    "cross_entropy_ignore",
    "DepthTrunk",
    "MlpPoints",
    "confidence_merge",
    "ResNet34Encoder",
    "TransformerCascade",
    "MIN_DEPTH",
    "MAX_DEPTH",
]
