"""Runtime projection ops: equi2pers / pers2equi on device.

Layouts (TPU-native, channel-last):
  ERP image:   (B, H, W, C)
  patch stack: (B, P, h, w, C)

Behavioral parity: equi_pers/equi2pers_v3.py:20-122 and
equi_pers/pers2equi_v3.py:16-198 of the torch reference (bilinear
border-padded align_corners=True sampling forward; confidence-style
L1-normalized 4-corner blend inverse), with all grid math hoisted to build
time (see omnifusion_tpu.projection.spec).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from omnifusion_tpu.ops.sparse_blend import quad_gather_blend_with_vjp
from omnifusion_tpu.projection.spec import (
    Equi2PersGrids,
    Pers2EquiGrids,
    ProjectionSpec,
    build_equi2pers_grids,
    build_pers2equi_grids,
)


class PatchProjection(NamedTuple):
    """equi2pers result bundle (mirrors the reference's 4-tuple return)."""

    pers: jnp.ndarray  # (B, P, h, w, C)
    xyz: jnp.ndarray  # (P, h, w, 3)
    uv: jnp.ndarray  # (P, h, w, 2)
    centers: jnp.ndarray  # (P, 2)


def equi2pers(erp: jnp.ndarray, grids: Equi2PersGrids, impl: str = "xla") -> jnp.ndarray:
    """Project an ERP image onto all tangent patches.

    erp: (B, H, W, C) -> (B, P, h, w, C).

    impl="pallas" routes the blend through the index-major Pallas kernel
    (ops.pallas_blend) when batch*channel fills a 128-lane vector; falls
    back to the XLA path otherwise.
    """
    spec = grids.spec
    b, h, w, c = erp.shape
    assert (h, w) == (spec.erp_h, spec.erp_w), (erp.shape, spec)
    src = erp.reshape(b, h * w, c)
    out = quad_gather_blend_with_vjp(
        src, grids.idx, grids.w4, spec.erp_w, grids.vjp, impl=impl
    )
    return out.reshape(b, spec.n_patches, spec.patch_h, spec.patch_w, c)


def equi2pers_full(erp: jnp.ndarray, grids: Equi2PersGrids) -> PatchProjection:
    """equi2pers plus the static geometric features (xyz, uv, centers)."""
    return PatchProjection(
        pers=equi2pers(erp, grids),
        xyz=grids.xyz,
        uv=grids.uv,
        centers=grids.centers,
    )


def pers2equi(pers: jnp.ndarray, grids: Pers2EquiGrids) -> jnp.ndarray:
    """Merge tangent patches back to an ERP image.

    pers: (B, P, h, w, C) -> (B, H, W, C).  Overlapping patches are blended
    with the precomputed L1-normalized bilinear weights.
    """
    spec = grids.spec
    b, p, h, w, c = pers.shape
    assert (p, h, w) == (spec.n_patches, spec.patch_h, spec.patch_w), (pers.shape, spec)
    src = pers.reshape(b, p * h * w, c)
    out = quad_gather_blend_with_vjp(
        src, grids.idx, grids.w4, spec.patch_w, grids.vjp, capped=grids.capped
    )
    return out.reshape(b, spec.erp_h, spec.erp_w, c)


def pers2equi_cf(
    pers_cf: jnp.ndarray, grids: Pers2EquiGrids, impl: str = "xla"
) -> jnp.ndarray:
    """Channel-first pers2equi: (B, C, P*h*w) -> (B, C, H, W).

    Identical sparse map to :func:`pers2equi`, but input and output ride in
    the gather's native (batch*channel, pixel) domain, eliminating both
    100+MB relayout transposes (the dominant non-gather cost of the merge at
    wide batch — see PERF_NOTES.md round-3 profile).  The channel-first
    layout is also what the confidence merge wants: num/den split on axis 1
    and the final (B, H*W) -> (B, H, W, 1) reshape are free.

    impl="pallas" routes the forward through the index-major Pallas
    blend-reduce kernel (ops.pallas_blend) when the batch*channel dim is
    lane-aligned; falls back to the XLA path otherwise.
    """
    spec = grids.spec
    b, c, n_in = pers_cf.shape
    assert n_in == spec.n_patches * spec.patch_h * spec.patch_w, (pers_cf.shape, spec)
    out = quad_gather_blend_with_vjp(
        pers_cf,
        grids.idx,
        grids.w4,
        spec.patch_w,
        grids.vjp,
        capped=grids.capped,
        channel_first=True,
        impl=impl,
    )
    return out.reshape(b, c, spec.erp_h, spec.erp_w)


def project(erp: jnp.ndarray, spec: ProjectionSpec) -> PatchProjection:
    """Convenience: build/cache grids for spec and run equi2pers_full."""
    return equi2pers_full(erp, build_equi2pers_grids(spec))


def unproject(pers: jnp.ndarray, spec: ProjectionSpec) -> jnp.ndarray:
    """Convenience: build/cache grids for spec and run pers2equi."""
    return pers2equi(pers, build_pers2equi_grids(spec))
