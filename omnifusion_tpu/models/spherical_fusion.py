"""Geometry-aware spherical fusion depth network (one-shot).

Behavioral parity: model/spherical_model.py:190-314 in the torch reference —
ERP -> tangent patches -> shared ResNet-34 encoder (+ geometric point
features at layer1) -> per-patch 512-d tokens -> 6-layer/4-head transformer
over the patch axis -> U-Net style decoder with encoder skips -> depth +
confidence heads -> confidence-weighted pers2equi merge.

TPU-native re-design:
  - patch axis folds into the batch for all convs (no Conv3d (k,k,1)
    emulation);
  - both projections are precomputed sparse gather-blends;
  - the token dimension is derived from the patch size
    (32 * (patch/32)^2 = 512 at the published 128x128 patches); the
    reference hard-codes 512, which crashes for 256x256 patches
    (spherical_model.py:211-212 vs test.py:45);
  - tokens are flattened channel-major to match the reference's
    reshape(bs, -1, n_patch), so torch checkpoints import 1:1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from omnifusion_tpu.models.layers import (
    ConvBnReLU,
    ConvParams,
    TorchBatchNorm,
    resize_bilinear,
    torch_conv,
)
from omnifusion_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, constrain
from omnifusion_tpu.models.resnet import ResNet34Encoder
from omnifusion_tpu.models.transformer import TransformerCascade
from omnifusion_tpu.projection.ops import equi2pers, pers2equi_cf
from omnifusion_tpu.projection.spec import (
    ProjectionSpec,
    build_equi2pers_grids,
    build_pers2equi_grids,
)

MIN_DEPTH = 0.1
MAX_DEPTH = 8.0


class MlpPoints(nn.Module):
    """Two 1x1 conv + BN + ReLU geometric embedding
    (model/spherical_model.py:228-235)."""

    hidden: int = 16
    out: int = 64
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = torch_conv(self.hidden, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train
        )
        x = nn.relu(x)
        x = torch_conv(self.out, 1, 1, 0, dtype=self.dtype, name="conv2")(x)
        x = TorchBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn2")(
            x, use_running_average=not train
        )
        return nn.relu(x)


class DepthTrunk(nn.Module):
    """Shared encoder/transformer/decoder/heads over a patch stack.

    Input patches (B, P, h, w, 3) and point features (B or 1, P, h/4, w/4, 64);
    returns per-patch (depth, confidence), each (B, P, h, w, 1).
    """

    depth: int = 6
    num_heads: int = 4
    pred_channels: int = 1
    pred_activation: str = "relu"  # 'relu' for depth, 'none' for seg logits
    use_transformer: bool = True  # False = legacy variant (network_360d.py:330-335)
    remat: bool = False  # rematerialize the encoder to trade FLOPs for HBM
    encoder_stages: Optional[tuple] = None  # override = compile-bounded dryruns
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    kernel_impl: str = "xla"
    # decoder-resize implementation, decoupled from kernel_impl.  Default
    # "conv" (separable depthwise lhs-dilated conv, exact-2x, value/grad
    # exact to 1e-7/1e-6 vs jax.image.resize): its transpose is itself a
    # conv, so fwd and bwd stay in conv layouts — on-chip it beat the XLA
    # dot_general lowering in BOTH phases (fwd b=256: 383.7 vs 400.9 ms;
    # train b=64: 268.7 vs 275.7 ms — measurements.log 2026-08-20).  The
    # fused pallas 2x stencil measured slower still (48.7 vs 15.3 ms for
    # the 5 decoder stages, resize_shootout) and stays an explicit opt-in.
    resize_impl: str = "conv"

    @nn.compact
    def __call__(self, patches, point_feat, train: bool = False):
        b, p, h, w, _ = patches.shape
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = patches.reshape(b * p, h, w, patches.shape[-1])
        # DP over batch, patch-axis model parallelism over the folded
        # (batch*patch) dim; no-op outside a mesh context
        x = constrain(x, (DATA_AXIS, MODEL_AXIS))
        if self.dtype is not None:
            x = x.astype(self.dtype)

        pf = jnp.broadcast_to(
            point_feat, (b, p) + point_feat.shape[2:]
        ).reshape(b * p, *point_feat.shape[2:])
        encoder_cls = (
            nn.remat(ResNet34Encoder, static_argnums=(2,)) if self.remat
            else ResNet34Encoder
        )
        ekw = dict(kw, stages=self.encoder_stages) if self.encoder_stages else kw
        feats = encoder_cls(name="encoder", **ekw)(x, train, pf.astype(x.dtype))
        conv1, l1, l2, l3, l4 = (
            feats["conv1"],
            feats["layer1"],
            feats["layer2"],
            feats["layer3"],
            feats["layer4"],
        )

        # global fusion: one channel-major-flattened token per patch
        # (spherical_model.py:263-268); use_transformer=False reproduces the
        # legacy no-fusion variant (network_360d.py:330-335)
        if self.use_transformer:
            hh, ww = l4.shape[1], l4.shape[2]
            emb = 32 * hh * ww
            tok = torch_conv(32, 1, 1, 0, use_bias=True, dtype=self.dtype, name="down")(l4)
            tok = tok.reshape(b, p, hh, ww, 32).transpose(0, 1, 4, 2, 3).reshape(b, p, emb)
            # global attention needs every patch token: replicate the patch
            # axis (GSPMD inserts one tiny all-gather over ICI)
            tok = constrain(tok, DATA_AXIS, None, None)
            tok = TransformerCascade(
                emb, p, depth=self.depth, num_heads=self.num_heads, name="transformer"
            )(tok)
            # token elements are re-interpreted as layer4 channels and
            # broadcast over space (spherical_model.py:267-268); only valid
            # when emb == 512, i.e. layer4 is 4x4 spatial (patch 128) —
            # otherwise fold tokens back to their source spatial layout.
            if emb == l4.shape[-1]:
                l4 = l4 + tok.reshape(b * p, 1, 1, emb)
                l4 = constrain(l4, (DATA_AXIS, MODEL_AXIS))
            else:
                tok_sp = tok.reshape(b, p, 32, hh, ww).transpose(0, 1, 3, 4, 2)
                l4 = l4 + torch_conv(
                    l4.shape[-1], 1, 1, 0, use_bias=True, dtype=self.dtype, name="up_proj"
                )(tok_sp.reshape(b * p, hh, ww, 32))

        def up_stage(x, skip, c0, c1, name0, name1):
            x = resize_bilinear(x, (skip.shape[1], skip.shape[2]), impl=self.resize_impl)
            x = ConvBnReLU(c0, name=name0, **kw)(x, train=train)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            return ConvBnReLU(c1, name=name1, **kw)(x, train=train)

        x = up_stage(l4, l3, 256, 128, "de_conv0_0", "de_conv0_1")
        x = up_stage(x, l2, 128, 64, "de_conv1_0", "de_conv1_1")
        x = up_stage(x, l1, 64, 64, "de_conv2_0", "de_conv2_1")
        x = up_stage(x, conv1, 64, 32, "de_conv3_0", "de_conv3_1")
        x = resize_bilinear(x, (h, w), impl=self.resize_impl)
        x = ConvBnReLU(32, name="de_conv4_0", **kw)(x, train=train)

        # fused heads: both 3x3 convs read the same (B*P, h, w, 32) feature
        # map (1.2 GB bf16 at b=64), so run them as ONE conv with
        # concatenated kernels — halves the head pass's HBM traffic while
        # each head keeps its own torch-mirrored parameter subtree
        pk, pb = ConvParams(self.pred_channels, x.shape[-1], name="pred")()
        wk, wb = ConvParams(1, x.shape[-1], name="weight_pred")()
        kern = jnp.concatenate([pk, wk], axis=-1).astype(x.dtype)
        bias = jnp.concatenate([pb, wb]).astype(x.dtype)
        y = (
            jax.lax.conv_general_dilated(
                x, kern, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias
        )
        pred = y[..., : self.pred_channels]
        if self.pred_activation == "relu":
            pred = nn.relu(pred)
        conf = nn.sigmoid(y[..., self.pred_channels :])
        return (
            pred.reshape(b, p, h, w, self.pred_channels),
            conf.reshape(b, p, h, w, 1),
        )


def confidence_merge(
    pred, conf, p2e_grids, use_confidence: bool = True, dtype=None, impl: str = "xla"
):
    """Merge per-patch depth to ERP with the confidence-weighted scheme
    (spherical_model.py:304-311): pers2equi(pred*conf) / pers2equi(conf).

    pred*conf and conf are packed into one 2-channel pers2equi call: the
    gather's leading (batch*channel) dim doubles, amortizing the TPU
    gather's per-index cost and helping it reach its byte-gated vectorized
    fast path (see PERF_NOTES.md and ops.sparse_blend._pad_leading).

    dtype: precision of the merge GATHER (default f32 — this is the final
    depth, so bf16 here costs ~0.2-0.4% depth error and is an explicit
    throughput opt-in, see PERF_NOTES; the normalizing division always
    happens in f32).

    The merge runs channel-first (pers2equi_cf): (pred*conf, conf) stack on
    axis 1, the num/den split is a free slice, and the (B, H, W, 1) depth
    assembly is a free reshape — no relayout transposes anywhere."""
    mdt = jnp.float32 if dtype is None else dtype
    b = pred.shape[0]
    if not use_confidence:
        src = pred.astype(mdt).reshape(b, 1, -1)
        return (
            pers2equi_cf(src, p2e_grids, impl=impl)
            .astype(jnp.float32)
            .reshape(b, p2e_grids.spec.erp_h, p2e_grids.spec.erp_w, 1)
        )
    pred = pred.astype(mdt).reshape(b, -1)
    conf = conf.astype(mdt).reshape(b, -1)
    merged = pers2equi_cf(jnp.stack([pred * conf, conf], axis=1), p2e_grids, impl=impl)
    num, den = merged[:, 0].astype(jnp.float32), merged[:, 1].astype(jnp.float32)
    zero = (den <= 1e-8).astype(jnp.float32)
    return (num / (den + 1e-8 * zero))[..., None]


class SphericalFusion(nn.Module):
    """One-shot model: ERP (B, H, W, 3) -> depth (B, H, W, 1)."""

    spec: ProjectionSpec
    depth: int = 6
    num_heads: int = 4
    use_transformer: bool = True
    remat: bool = False
    encoder_stages: Optional[tuple] = None
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # precision of the final merge gather; None = f32 (the default even when
    # dtype=bf16 — see confidence_merge)
    merge_dtype: Optional[jnp.dtype] = None
    # "pallas" = d-major Pallas blend-reduce for BOTH projections
    # (single-chip throughput mode; auto-falls-back when batch*channel
    # doesn't fill a 128-lane vector)
    kernel_impl: str = "xla"
    # decoder-resize impl; "conv" won the on-chip A/B in both phases
    # (see DepthTrunk.resize_impl)
    resize_impl: str = "conv"

    @nn.compact
    def __call__(self, rgb, train: bool = False, confidence: bool = True):
        spec = self.spec
        assert rgb.shape[1:3] == (spec.erp_h, spec.erp_w), (rgb.shape, spec)
        b = rgb.shape[0]
        p = spec.n_patches
        grids_hr = build_equi2pers_grids(spec)
        spec_q = spec.with_patch_scale(4)
        grids_q = build_equi2pers_grids(spec_q)

        # cast BEFORE the projection when running mixed precision: the
        # equi2pers gather is bandwidth-bound on TPU, so gathering bf16
        # halves its traffic, and the trunk consumes bf16 anyway
        if self.dtype is not None:
            rgb = rgb.astype(self.dtype)
        patches = equi2pers(rgb, grids_hr, impl=self.kernel_impl)  # (B, P, h, w, 3)

        # geometric embedding input: (center, rho=1, center) per patch pixel
        # at quarter resolution (spherical_model.py:245-251)
        centers = grids_q.centers  # (P, 2)
        geo = jnp.concatenate(
            [centers, jnp.ones((p, 1), jnp.float32), centers], axis=-1
        )
        geo = jnp.broadcast_to(
            geo[:, None, None, :], (p, spec_q.patch_h, spec_q.patch_w, 5)
        )
        pf = MlpPoints(
            axis_name=self.axis_name, dtype=self.dtype, name="mlp_points"
        )(geo, train=train)

        pred, conf = DepthTrunk(
            depth=self.depth,
            num_heads=self.num_heads,
            use_transformer=self.use_transformer,
            remat=self.remat,
            encoder_stages=self.encoder_stages,
            axis_name=self.axis_name,
            dtype=self.dtype,
            kernel_impl=self.kernel_impl,
            resize_impl=self.resize_impl,
            name="trunk",
        )(patches, pf[None], train=train)

        return confidence_merge(
            pred,
            conf,
            build_pers2equi_grids(spec),
            use_confidence=confidence,
            dtype=self.merge_dtype,
            impl=self.kernel_impl,
        )
