"""Iterative-refinement spherical fusion model.

Behavioral parity: model/spherical_model_iterative.py:253-456 — the first
pass embeds unit-sphere coordinates (mlp_points1); each refinement pass
re-projects the previous ERP depth into patches, scales the unit-sphere
coords by depth to form 3D points, embeds them with mlp_points2, and reruns
the SAME trunk (shared weights).  Returns the per-iteration ERP predictions.

The iteration count is static, so the loop is unrolled under jit (two
compiled trunk calls sharing weights); the reference's Python loop
(spherical_model_iterative.py:383) re-derives projection grids per call,
ours reuses the precomputed tables.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from omnifusion_tpu.models.spherical_fusion import (
    DepthTrunk,
    MlpPoints,
    confidence_merge,
)
from omnifusion_tpu.projection.ops import equi2pers
from omnifusion_tpu.projection.spec import (
    ProjectionSpec,
    build_equi2pers_grids,
    build_pers2equi_grids,
)


class SphericalFusionIterative(nn.Module):
    """ERP (B, H, W, 3) -> list of depth maps (B, H, W, 1), one per iteration."""

    spec: ProjectionSpec
    num_iters: int = 2
    depth: int = 6
    num_heads: int = 4
    use_transformer: bool = True
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # precision of the final merge gather; None = f32 (see confidence_merge)
    merge_dtype: Optional[jnp.dtype] = None
    # "pallas" = d-major Pallas blend-reduce for both projections (see SphericalFusion)
    kernel_impl: str = "xla"
    # decoder-resize impl, decoupled from kernel_impl (see SphericalFusion)
    resize_impl: str = "conv"

    @nn.compact
    def __call__(self, rgb, train: bool = False, confidence: bool = False):
        spec = self.spec
        assert rgb.shape[1:3] == (spec.erp_h, spec.erp_w), (rgb.shape, spec)
        grids_hr = build_equi2pers_grids(spec)
        spec_q = spec.with_patch_scale(4)
        grids_q = build_equi2pers_grids(spec_q)
        p2e = build_pers2equi_grids(spec)

        trunk = DepthTrunk(
            depth=self.depth,
            num_heads=self.num_heads,
            use_transformer=self.use_transformer,
            remat=self.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            kernel_impl=self.kernel_impl,
            resize_impl=self.resize_impl,
            name="trunk",
        )
        mlp1 = MlpPoints(axis_name=self.axis_name, dtype=self.dtype, name="mlp_points1")
        mlp2 = MlpPoints(axis_name=self.axis_name, dtype=self.dtype, name="mlp_points2")

        # cast BEFORE the projection when running mixed precision (the
        # bandwidth-bound equi2pers gather then moves half the bytes)
        if self.dtype is not None:
            rgb = rgb.astype(self.dtype)
        patches = equi2pers(rgb, grids_hr, impl=self.kernel_impl)  # (B, P, h, w, 3)

        # pass 1: unit-sphere xyz embedding (spherical_model_iterative.py:315-319)
        pf = mlp1(grids_q.xyz, train=train)  # (P, h/4, w/4, 64)
        pred, conf = trunk(patches, pf[None], train=train)
        preds = [confidence_merge(pred, conf, p2e, use_confidence=confidence, dtype=self.merge_dtype, impl=self.kernel_impl)]

        # refinement passes: 3D point embedding from previous depth
        # (spherical_model_iterative.py:383-398)
        for _ in range(self.num_iters - 1):
            depth_patches = equi2pers(preds[-1], grids_q, impl=self.kernel_impl)  # (B, P, h/4, w/4, 1)
            points = grids_q.xyz[None] * depth_patches  # (B, P, h/4, w/4, 3)
            pf_i = mlp2(
                points.reshape((-1,) + points.shape[2:]), train=train
            ).reshape(points.shape[:2] + (spec_q.patch_h, spec_q.patch_w, 64))
            pred, conf = trunk(patches, pf_i, train=train)
            preds.append(confidence_merge(pred, conf, p2e, use_confidence=confidence, dtype=self.merge_dtype, impl=self.kernel_impl))

        return preds
