"""Depth evaluation metrics, fully jittable.

Parity: metrics.py:7-26 and the shared eval protocol of test.py:149-177
(median scaling of the prediction before metrics, pixel-count weighting).
The reference's boolean advanced indexing (``pred[mask>0]``) is shape-dynamic
and impossible under jit; every reduction here is a masked mean and the
median is NaN-based, producing identical values.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(values, mask):
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def abs_rel_error(pred, gt, mask):
    return _masked_mean(jnp.abs(pred - gt) / jnp.maximum(gt, 1e-12), mask > 0)


def sq_rel_error(pred, gt, mask):
    return _masked_mean(jnp.square(pred - gt) / jnp.maximum(gt, 1e-12), mask > 0)


def lin_rms_sq_error(pred, gt, mask):
    return _masked_mean(jnp.square(pred - gt), mask > 0)


def log_rms_sq_error(pred, gt, mask):
    valid = (mask > 0) & (pred > 1e-7) & (gt > 1e-7)
    safe_pred = jnp.maximum(pred, 1e-7)
    safe_gt = jnp.maximum(gt, 1e-7)
    return _masked_mean(jnp.square(jnp.log(safe_pred) - jnp.log(safe_gt)), valid)


def delta_inlier_ratio(pred, gt, mask, degree: int = 1):
    safe_pred = jnp.maximum(pred, 1e-12)
    safe_gt = jnp.maximum(gt, 1e-12)
    ratio = jnp.maximum(safe_pred / safe_gt, safe_gt / safe_pred)
    return _masked_mean((ratio < 1.25**degree).astype(jnp.float32), mask > 0)


def masked_median(values, mask):
    """Median over masked elements (sort-based, jit-safe).

    Uses torch semantics — the LOWER of the two middle elements for even
    counts (torch.median, used at test.py:160) — not numpy's average.
    """
    v = jnp.where(mask > 0, values, jnp.inf).reshape(-1)
    v = jnp.sort(v)
    count = jnp.sum((mask > 0).astype(jnp.int32))
    return v[jnp.maximum(count - 1, 0) // 2]


def compute_depth_metrics(pred, gt, mask, median_scale: bool = True):
    """The full test.py metric suite on one batch.

    Returns (metrics dict, N) where N is the valid-pixel count used for
    meter weighting (test.py:156-177).
    """
    n = jnp.sum((mask > 0).astype(jnp.float32))
    if median_scale:
        scale = masked_median(gt, mask) / jnp.maximum(
            masked_median(pred, mask), 1e-12
        )
        pred = pred * scale
    metrics = {
        "abs_rel": abs_rel_error(pred, gt, mask),
        "sq_rel": sq_rel_error(pred, gt, mask),
        "lin_rms_sq": lin_rms_sq_error(pred, gt, mask),
        "log_rms_sq": log_rms_sq_error(pred, gt, mask),
        "d1": delta_inlier_ratio(pred, gt, mask, 1),
        "d2": delta_inlier_ratio(pred, gt, mask, 2),
        "d3": delta_inlier_ratio(pred, gt, mask, 3),
    }
    return metrics, n
