"""Semantic-segmentation spherical fusion.

The reference ships a segmentation trainer (train_erp_sem.py) that is
unrunnable: it imports a nonexistent dataset module and calls the model with
a legacy signature (SURVEY.md §2.5).  This is the working equivalent: same
geometry-aware trunk, a num_classes logit head (no ReLU), logits merged to
ERP with the confidence-weighted pers2equi blend, cross-entropy with
ignore-index -1 (train_erp_sem.py:203), mIoU eval via
omnifusion_tpu.utils.iou.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from omnifusion_tpu.models.spherical_fusion import DepthTrunk, MlpPoints
from omnifusion_tpu.projection.ops import equi2pers, pers2equi_cf
from omnifusion_tpu.projection.spec import (
    ProjectionSpec,
    build_equi2pers_grids,
    build_pers2equi_grids,
)


class SphericalFusionSeg(nn.Module):
    """ERP (B, H, W, 3) -> class logits (B, H, W, num_classes)."""

    spec: ProjectionSpec
    num_classes: int = 13  # Stanford2D3D semantic classes (iou.py)
    depth: int = 6
    num_heads: int = 4
    use_transformer: bool = True
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # "pallas" = index-major blend-reduce + fused upsamples (see SphericalFusion)
    kernel_impl: str = "xla"

    @nn.compact
    def __call__(self, rgb, train: bool = False, confidence: bool = True):
        spec = self.spec
        assert rgb.shape[1:3] == (spec.erp_h, spec.erp_w), (rgb.shape, spec)
        p = spec.n_patches
        grids_hr = build_equi2pers_grids(spec)
        spec_q = spec.with_patch_scale(4)
        grids_q = build_equi2pers_grids(spec_q)

        # cast BEFORE the projection when running mixed precision (the
        # bandwidth-bound equi2pers gather then moves half the bytes)
        if self.dtype is not None:
            rgb = rgb.astype(self.dtype)
        patches = equi2pers(rgb, grids_hr, impl=self.kernel_impl)
        centers = grids_q.centers
        geo = jnp.concatenate([centers, jnp.ones((p, 1), jnp.float32), centers], -1)
        geo = jnp.broadcast_to(
            geo[:, None, None, :], (p, spec_q.patch_h, spec_q.patch_w, 5)
        )
        pf = MlpPoints(axis_name=self.axis_name, dtype=self.dtype, name="mlp_points")(
            geo, train=train
        )
        logits, conf = DepthTrunk(
            depth=self.depth,
            num_heads=self.num_heads,
            pred_channels=self.num_classes,
            pred_activation="none",
            use_transformer=self.use_transformer,
            remat=self.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            kernel_impl=self.kernel_impl,
            name="trunk",
        )(patches, pf[None], train=train)

        # channel-first merge, num/den PACKED into one pers2equi call
        # (C = num_classes + 1) — one gather instead of two, no relayout
        # transposes (same scheme as spherical_fusion.confidence_merge)
        b = logits.shape[0]
        nc = self.num_classes
        logits = logits.astype(jnp.float32)
        p2e = build_pers2equi_grids(spec)
        lg_cf = logits.reshape(b, -1, nc).transpose(0, 2, 1)  # (B, C, N_in)
        if confidence:
            conf_cf = conf.astype(jnp.float32).reshape(b, 1, -1)
            merged = pers2equi_cf(
                jnp.concatenate([lg_cf * conf_cf, conf_cf], axis=1),
                p2e,
                impl=self.kernel_impl,
            )  # (B, C+1, H, W)
            num = merged[:, :nc].transpose(0, 2, 3, 1)
            den = merged[:, nc:].transpose(0, 2, 3, 1)
            zero = (den <= 1e-8).astype(jnp.float32)
            return num / (den + 1e-8 * zero)
        out = pers2equi_cf(lg_cf, p2e, impl=self.kernel_impl)
        return out.transpose(0, 2, 3, 1)


def cross_entropy_ignore(logits, labels, ignore_index: int = -1):
    """Mean cross-entropy over labels != ignore_index
    (train_erp_sem.py:203 semantics).

    logits: (B, H, W, C); labels: (B, H, W) int.
    """
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
