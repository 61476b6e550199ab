"""Projection configuration and precomputed static grids.

Both directions of the gnomonic tangent-patch projection are *static sparse
linear maps* over pixels: every output pixel is a fixed weighted sum of at
most K input pixels, with indices and weights fully determined by
(fov, nrows, patch_size, erp_size).  We therefore precompute, once per
config:

  - equi2pers: 4 bilinear corner indices + weights per patch pixel
    (the reference re-derives the grid on CPU inside every forward call and
    samples with F.grid_sample, equi_pers/equi2pers_v3.py:29-111);
  - pers2equi: per-ERP-pixel contributions from all overlapping patches,
    thresholded, L1-normalized, and *compacted to the top-K nonzero terms*
    (the reference gathers all n_patch x 4 corners every call and normalizes
    at runtime, equi_pers/pers2equi_v3.py:171-196 — the normalized weights
    are constants, so we fold the normalization into the table).

The runtime op for both directions is a single fused gather-blend
(see omnifusion_tpu.ops.sparse_blend).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax.numpy as jnp
from flax import struct

from omnifusion_tpu.geometry import gnomonic
from omnifusion_tpu.geometry.layout import (
    num_patches,
    patch_centers_normalized,
    patch_centers_radians,
    uniform_patch_centers,
)
from omnifusion_tpu.projection import table_cache


def _pair(t):
    return tuple(t) if isinstance(t, (tuple, list)) else (t, t)


@dataclasses.dataclass(frozen=True)
class ProjectionSpec:
    """Static configuration of the tangent-patch projection pair."""

    erp_h: int
    erp_w: int
    patch_h: int
    patch_w: int
    fov_h: float
    fov_w: float
    nrows: int
    layout: str = "rings"  # "rings" (equi2pers_v3) or "uniform:RxC" (v2)

    @classmethod
    def create(
        cls, erp_size, patch_size, fov=(80, 80), nrows: int = 4, layout: str = "rings"
    ) -> "ProjectionSpec":
        erp_h, erp_w = _pair(erp_size)
        patch_h, patch_w = _pair(patch_size)
        fov_h, fov_w = _pair(fov)
        return cls(
            erp_h=int(erp_h),
            erp_w=int(erp_w),
            patch_h=int(patch_h),
            patch_w=int(patch_w),
            fov_h=float(fov_h),
            fov_w=float(fov_w),
            nrows=int(nrows),
            layout=str(layout),
        )

    def _uniform_shape(self):
        rows, cols = self.layout.split(":", 1)[1].split("x")
        return int(rows), int(cols)

    @property
    def n_patches(self) -> int:
        if self.layout.startswith("uniform"):
            r, c = self._uniform_shape()
            return r * c
        return num_patches(self.nrows)

    def centers_deg(self) -> np.ndarray:
        """Patch centers in degrees (theta in (0,360), phi in (-90,90))."""
        from omnifusion_tpu.geometry.layout import patch_centers

        if self.layout.startswith("uniform"):
            return uniform_patch_centers(*self._uniform_shape())
        return patch_centers(self.nrows)

    def centers_radians(self) -> np.ndarray:
        c = self.centers_deg()
        out = np.empty_like(c)
        out[:, 0] = (c[:, 0] / 180.0 - 1.0) * np.pi
        out[:, 1] = c[:, 1] / 90.0 * (np.pi / 2.0)
        return out

    def centers_normalized(self) -> np.ndarray:
        c = self.centers_deg()
        out = np.empty_like(c)
        out[:, 0] = c[:, 0] / 180.0 - 1.0
        out[:, 1] = c[:, 1] / 90.0
        return out

    def with_patch_scale(self, denom: int) -> "ProjectionSpec":
        """Same spec at a reduced patch resolution (e.g. /4 for geometry feats)."""
        return dataclasses.replace(
            self, patch_h=self.patch_h // denom, patch_w=self.patch_w // denom
        )


@struct.dataclass
class Equi2PersGrids:
    """Static tables for ERP -> tangent patches.

    idx/w4 implement bilinear sampling with border padding and
    align_corners=True semantics (torch F.grid_sample parity) in quad form:
    one fetch of the 2x2 neighborhood per output pixel, border-clamped
    corner weights folded into the surviving corner (see
    omnifusion_tpu.ops.sparse_blend.quad_gather_blend).
    """

    idx: jnp.ndarray  # (P*h*w, 1) int32 top-left corner into erp_h*erp_w
    w4: jnp.ndarray  # (P*h*w, 1, 4) float32 quad weights [00, 01, 10, 11]
    xyz: jnp.ndarray  # (P, h, w, 3) unit-sphere coords per patch pixel
    uv: jnp.ndarray  # (P, h, w, 2) normalized (lon, lat) in [-1, 1]
    centers: jnp.ndarray  # (P, 2) normalized patch centers in [-1, 1]
    vjp: tuple  # transposed tables for the custom backward (see build_vjp_tables)
    spec: ProjectionSpec = struct.field(pytree_node=False)


@struct.dataclass
class Pers2EquiGrids:
    """Static tables for tangent patches -> ERP (confidence-style blending).

    Per ERP pixel: the top-left corner index of a bilinear quad in each of
    the <=K contributing patches, plus pre-normalized quad weights
    (sum over K*4 is 1 wherever any patch covers the pixel, 0 elsewhere).

    ``capped`` is the same sparse map re-packed for the runtime: the K=4
    dense table is only ~52% live at the flagship config (most ERP pixels
    see 2 patches; the 4-patch corners are rare), and the TPU gather's cost
    scales with fetched (index, element) volume — so the runtime table keeps
    a dense cap of the heaviest contributors per pixel and spills the rest
    to a sorted COO tail (one gather + segment_sum).  None when the dense
    table is already tight (see build_capped_tables).
    """

    idx: jnp.ndarray  # (erp_h*erp_w, K) int32 into P*h*w
    w4: jnp.ndarray  # (erp_h*erp_w, K, 4) float32 [00, 01, 10, 11]
    vjp: tuple  # transposed tables for the custom backward (see build_vjp_tables)
    capped: tuple | None  # (idx_c, w_c, tail_pix, tail_idx, tail_w) or None
    spec: ProjectionSpec = struct.field(pytree_node=False)


# ---------------------------------------------------------------------------
# builders (host-side, float64, run once per spec)
# ---------------------------------------------------------------------------

def _forward_angles(spec: ProjectionSpec):
    """(lon, lat) radians per patch pixel, shape (P, h, w) each.

    lon is unwrapped (can exceed +-pi); used both for sampling coords and for
    the xyz/uv geometric features.
    """
    h, w = spec.patch_h, spec.patch_w
    sx = np.linspace(0.0, 1.0, w)
    sy = np.linspace(0.0, 1.0, h)
    x = gnomonic.screen_to_tangent(sx, spec.fov_w, 360.0)[None, None, :]  # (1,1,w)
    y = gnomonic.screen_to_tangent(sy, spec.fov_h, 180.0)[None, :, None]  # (1,h,1)
    centers = spec.centers_radians()  # (P, 2)
    theta_c = centers[:, 0][:, None, None]
    phi_c = centers[:, 1][:, None, None]
    lon, lat = gnomonic.forward(
        np.broadcast_to(x, (spec.n_patches, h, w)),
        np.broadcast_to(y, (spec.n_patches, h, w)),
        theta_c,
        phi_c,
    )
    return lon, lat


def _fold_clamped_corners(w4: np.ndarray, x_clamped: np.ndarray, y_clamped: np.ndarray) -> np.ndarray:
    """Fold the weights of border-clamped bilinear corners into the
    coincident surviving corner (x1==x0 and/or y1==y0 after clamping).

    Makes quad fetches safe: the rolled neighbor values at those positions
    are garbage (they wrap across a row/patch boundary) but carry weight 0.
    w4 order: [w00, w01, w10, w11]; x_clamped/y_clamped broadcast to w4[..., 0].
    """
    w00, w01, w10, w11 = (w4[..., i] for i in range(4))
    w00 = w00 + np.where(x_clamped, w01, 0.0)
    w10 = w10 + np.where(x_clamped, w11, 0.0)
    w01 = np.where(x_clamped, 0.0, w01)
    w11 = np.where(x_clamped, 0.0, w11)
    w00 = w00 + np.where(y_clamped, w10, 0.0)
    w01 = w01 + np.where(y_clamped, w11, 0.0)
    w10 = np.where(y_clamped, 0.0, w10)
    w11 = np.where(y_clamped, 0.0, w11)
    return np.stack([w00, w01, w10, w11], axis=-1)


def build_vjp_tables(
    idx: np.ndarray,
    w4: np.ndarray,
    row_stride: int,
    n_in: int,
    cap: int = 16,
    scatter_cost: float = 3.0,
):
    """Transpose the quad-table sparse map for the custom backward, in QUAD
    granularity: all 4 corners of a forward fetch share one top-left index,
    so the transposed table stores one entry per (input quad, output pixel)
    with the 4 corner weights attached — 4x fewer backward gather indices
    than a corner-level transpose (the corner split is recovered by 3 cheap
    rolls in the apply, see sparse_blend.transposed_quad_gather_blend).

    The dense fan-in K_T is chosen per table by minimizing estimated gather
    work ``n_in*k + scatter_cost*overflow(k)`` (an overflow entry costs one
    gather index plus a segment-sum scatter): the fan-in distribution is
    heavy-tailed (flagship p2e transpose: mean 3.7, max 1017; e2p transpose:
    mean 0.56, max 4), so a tight cap with a fatter COO tail fetches far
    less than covering the tail densely.

    Returns (idx_t (N_in, K_T) int32, w_t (N_in, K_T, 4) f32,
    over_src (M,) i32, over_dst (M,) i32, over_w (M, 4) f32): a
    fan-in-capped transposed table plus a COO overflow (sorted by
    destination) for the heavy tail (pole-patch border pixels whose quads
    absorb clamp-folded weights).
    """
    n_out, k = idx.shape
    j = idx.astype(np.int64).reshape(-1)
    w = np.asarray(w4, np.float64).reshape(-1, 4)
    n = np.repeat(np.arange(n_out, dtype=np.int64), k)
    keep = w.sum(-1) > 0
    j, w, n = j[keep], w[keep], n[keep]
    order = np.argsort(j, kind="stable")
    j, w, n = j[order], w[order], n[order]

    counts = np.bincount(j, minlength=n_in)
    if len(j):
        hi = int(min(counts.max(), cap))
        costs = [
            n_in * c + scatter_cost * np.maximum(counts - c, 0).sum()
            for c in range(1, hi + 1)
        ]
        k_t = int(np.argmin(costs)) + 1
    else:
        k_t = 1
    rank = np.arange(len(j)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    in_table = rank < k_t
    idx_t = np.zeros((n_in, max(k_t, 1)), np.int32)
    w_t = np.zeros((n_in, max(k_t, 1), 4), np.float32)
    idx_t[j[in_table], rank[in_table]] = n[in_table]
    w_t[j[in_table], rank[in_table]] = w[in_table]

    over = ~in_table
    return (
        idx_t,
        w_t,
        n[over].astype(np.int32),
        j[over].astype(np.int32),
        w[over].astype(np.float32),
    )


def _vjp_arrays(vjp: tuple) -> dict:
    return {f"vjp{i}": a for i, a in enumerate(vjp)}


def _vjp_from(d: dict) -> tuple:
    return tuple(d[f"vjp{i}"] for i in range(5))


@functools.lru_cache(maxsize=None)
def build_equi2pers_grids(spec: ProjectionSpec) -> Equi2PersGrids:
    cached = table_cache.load("e2p", spec)
    if cached is not None:
        return Equi2PersGrids(
            idx=cached["idx"],
            w4=cached["w4"],
            xyz=cached["xyz"],
            uv=cached["uv"],
            centers=cached["centers"],
            vjp=_vjp_from(cached),
            spec=spec,
        )
    g = _build_equi2pers_grids(spec)
    table_cache.save(
        "e2p",
        spec,
        dict(idx=g.idx, w4=g.w4, xyz=g.xyz, uv=g.uv, centers=g.centers,
             **_vjp_arrays(g.vjp)),
    )
    return g


def _build_equi2pers_grids(spec: ProjectionSpec) -> Equi2PersGrids:
    lon, lat = _forward_angles(spec)
    lon_n = lon / np.pi
    lat_n = lat / (np.pi / 2.0)
    # longitude wraparound into [-1, 1] (equi2pers_v3.py:103-104)
    lon_n = np.where(lon_n > 1.0, lon_n - 2.0, lon_n)
    lon_n = np.where(lon_n < -1.0, lon_n + 2.0, lon_n)

    # align_corners=True unnormalization + border padding (clamp)
    ix = np.clip((lon_n + 1.0) * 0.5 * (spec.erp_w - 1), 0.0, spec.erp_w - 1)
    iy = np.clip((lat_n + 1.0) * 0.5 * (spec.erp_h - 1), 0.0, spec.erp_h - 1)

    x0 = np.floor(ix).astype(np.int64)
    y0 = np.floor(iy).astype(np.int64)
    fx = ix - x0
    fy = iy - y0

    w4 = np.stack(
        [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], axis=-1
    )
    w4 = _fold_clamped_corners(
        w4, x0 + 1 > spec.erp_w - 1, y0 + 1 > spec.erp_h - 1
    )
    idx = (y0 * spec.erp_w + x0).reshape(-1, 1)
    w4 = w4.reshape(-1, 1, 4)

    cos_lat = np.cos(lat)
    xyz = np.stack(
        [cos_lat * np.sin(lon), cos_lat * np.cos(lon), np.sin(lat)], axis=-1
    )
    uv = np.stack([lon_n, lat_n], axis=-1)
    centers = spec.centers_normalized()

    # NOTE: tables are kept as host numpy arrays — they become baked-in
    # constants at trace time.  (Creating jnp arrays here would leak tracers
    # into the lru_cache when the first build happens under a transform.)
    idx = np.asarray(idx, dtype=np.int32)
    w4 = np.asarray(w4, dtype=np.float32)
    return Equi2PersGrids(
        idx=idx,
        w4=w4,
        xyz=np.asarray(xyz, dtype=np.float32),
        uv=np.asarray(uv, dtype=np.float32),
        centers=np.asarray(centers, dtype=np.float32),
        vjp=build_vjp_tables(idx, w4, spec.erp_w, spec.erp_h * spec.erp_w),
        spec=spec,
    )


@functools.lru_cache(maxsize=None)
def build_pers2equi_grids(spec: ProjectionSpec) -> Pers2EquiGrids:
    cached = table_cache.load("p2e", spec)
    if cached is not None:
        capped = (
            tuple(cached[f"cap{i}"] for i in range(5)) if "cap0" in cached else None
        )
        return Pers2EquiGrids(
            idx=cached["idx"],
            w4=cached["w4"],
            vjp=_vjp_from(cached),
            capped=capped,
            spec=spec,
        )
    g = _build_pers2equi_grids(spec)
    arrays = dict(idx=g.idx, w4=g.w4, **_vjp_arrays(g.vjp))
    if g.capped is not None:
        arrays.update({f"cap{i}": a for i, a in enumerate(g.capped)})
    table_cache.save("p2e", spec, arrays)
    return g


def _build_pers2equi_grids(spec: ProjectionSpec) -> Pers2EquiGrids:
    P = spec.n_patches
    ph, pw = spec.patch_h, spec.patch_w
    erp_h, erp_w = spec.erp_h, spec.erp_w

    lat = np.linspace(-np.pi / 2.0, np.pi / 2.0, erp_h)[None, :, None]
    lon = np.linspace(-np.pi, np.pi, erp_w)[None, None, :]
    centers = spec.centers_radians()
    theta_c = centers[:, 0][:, None, None]
    phi_c = centers[:, 1][:, None, None]

    x, y, cos_c = gnomonic.inverse(
        np.broadcast_to(lon, (P, erp_h, erp_w)),
        np.broadcast_to(lat, (P, erp_h, erp_w)),
        theta_c,
        phi_c,
    )
    x_n = x / (spec.fov_w / 360.0 * np.pi)
    y_n = y / (spec.fov_h / 180.0 * (np.pi / 2.0))
    # Pixel coords in [0, pw] x [0, ph].  (The reference scales x by height
    # and y by width, pers2equi_v3.py:122-123 — identical for the square
    # patches it always uses; we scale each axis by its own size.)
    x_pix = (x_n + 1.0) * 0.5 * pw
    y_pix = (y_n + 1.0) * 0.5 * ph

    mask = (
        (x_pix > 0) & (x_pix < pw) & (y_pix > 0) & (y_pix < ph) & (cos_c > 0)
    ).astype(np.float64)

    x0 = np.clip(np.floor(x_pix), 0, pw - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, pw - 1)
    y0 = np.clip(np.floor(y_pix), 0, ph - 1).astype(np.int64)
    y1 = np.clip(y0 + 1, 0, ph - 1)

    # Bilinear corner weights computed from the *clamped* corners, then
    # masked and thresholded — matching pers2equi_v3.py:139-152,191.
    # Quad order [00, 01, 10, 11] = [(y0,x0), (y0,x1), (y1,x0), (y1,x1)].
    with np.errstate(invalid="ignore"):
        w00 = (x1 - x_pix) * (y1 - y_pix) * mask
        w01 = (x_pix - x0) * (y1 - y_pix) * mask
        w10 = (x1 - x_pix) * (y_pix - y0) * mask
        w11 = (x_pix - x0) * (y_pix - y0) * mask
    w_all = np.stack([w00, w01, w10, w11], axis=-1)  # (P, H, W, 4)
    w_all = np.nan_to_num(w_all, nan=0.0, posinf=0.0, neginf=0.0)
    w_all = w_all * (w_all > 1e-5)

    # normalize jointly over all patch/corner contributions per pixel
    # (pers2equi_v3.py:189-192)
    N = erp_h * erp_w
    w_px = w_all.transpose(1, 2, 0, 3).reshape(N, P, 4)
    denom = np.maximum(w_px.sum(axis=(1, 2), keepdims=True), 1e-12)
    w_px = w_px / denom

    # fold clamped corners so quad fetches are safe, AFTER normalization
    # (the folded pairs point at the same source pixel, so sums are equal)
    xc = (x1 == x0).transpose(1, 2, 0).reshape(N, P)
    yc = (y1 == y0).transpose(1, 2, 0).reshape(N, P)
    w_px = _fold_clamped_corners(w_px, xc, yc)

    base = (
        (np.arange(P, dtype=np.int64) * (ph * pw))[:, None, None] + y0 * pw + x0
    )  # (P, H, W)
    base_px = base.transpose(1, 2, 0).reshape(N, P)

    # compact to the top-K contributing patches per pixel
    totals = w_px.sum(axis=-1)  # (N, P)
    K = max(int((totals > 0).sum(axis=1).max()), 1)
    order = np.argsort(-totals, axis=1, kind="stable")[:, :K]
    rows = np.arange(N)[:, None]
    w_k = w_px[rows, order]  # (N, K, 4)
    idx_k = np.where(totals[rows, order] > 0, base_px[rows, order], 0)

    idx_k = np.asarray(idx_k, dtype=np.int32)
    w_k = np.asarray(w_k, dtype=np.float32)
    return Pers2EquiGrids(
        idx=idx_k,
        w4=w_k,
        vjp=build_vjp_tables(idx_k, w_k, pw, P * ph * pw),
        capped=build_capped_tables(idx_k, w_k),
        spec=spec,
    )


def build_capped_tables(idx_k: np.ndarray, w_k: np.ndarray, scatter_cost: float = 3.0):
    """Re-pack a slot-sorted (N, K) quad table as dense-cap + sorted COO tail.

    Picks the cap that minimizes estimated gather work
    ``N*cap + scatter_cost*tail(cap)`` (a COO tail entry costs one gather
    index plus a segment-sum scatter, ~3x a dense index); returns None when
    the dense table wins, i.e. the map is already tight.  Slots must be
    live-first per pixel (build_pers2equi_grids sorts by descending weight).
    """
    n, k = idx_k.shape
    live = w_k.sum(-1) > 0  # (N, K), front-packed per row
    counts = live.sum(1)
    tail_sizes = [int(np.maximum(counts - cap, 0).sum()) for cap in range(1, k + 1)]
    costs = [n * cap + scatter_cost * t for cap, t in zip(range(1, k + 1), tail_sizes)]
    cap = int(np.argmin(costs)) + 1
    if cap == k:
        return None
    tail_pix, tail_slot = np.nonzero(live[:, cap:])
    tail_slot = tail_slot + cap
    return (
        np.ascontiguousarray(idx_k[:, :cap]),
        np.ascontiguousarray(w_k[:, :cap]),
        tail_pix.astype(np.int32),
        idx_k[tail_pix, tail_slot].astype(np.int32),
        np.ascontiguousarray(w_k[tail_pix, tail_slot]),
    )
