"""OmniFusion-TPU: TPU-native 360 monocular depth estimation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
yuliangguo/OmniFusion ("OmniFusion: 360 Monocular Depth Estimation via
Geometry-Aware Fusion", CVPR 2022): equirectangular panoramas are projected
onto gnomonic tangent-plane patches, encoded by a shared ResNet-34 + global
transformer, decoded to per-patch depth + confidence, and merged back to the
panorama with confidence-weighted blending.

Layout conventions (TPU-native, differs from the torch reference):
  - ERP images:    (B, H, W, C)        [NHWC]
  - patch stacks:  (B, P, h, w, C)     [patch axis folds into batch for convs]
  - projection grids are built ONCE per (fov, nrows, patch, erp) config as
    static arrays (reference rebuilds them on CPU every forward call,
    equi_pers/equi2pers_v3.py:32-109, and caches pers2equi grids to disk by
    mutable name, pers2equi_v3.py:24-29).
"""

__version__ = "0.1.0"

from omnifusion_tpu.projection.spec import ProjectionSpec  # noqa: F401
