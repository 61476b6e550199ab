"""Train/eval step factories (jit + SPMD ready).

Mirrors the reference training recipe (train_erp_depth.py:156-294 /
train_erp_depth_iterative.py:263-279): AdamW(lr 1e-4, wd 0.01), cosine warm
restarts, BerHu supervision (mean over iterations for the iterative model),
BatchNorm running-stat updates.  Data parallelism is GSPMD: shard the batch
over the mesh's data axis and jit — gradients and BN statistics reduce over
ICI automatically (no DataParallel scatter/gather, no SyncBN thread
rendezvous).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omnifusion_tpu.evaluation.metrics import compute_depth_metrics
from omnifusion_tpu.losses.direct import berhu_loss
from omnifusion_tpu.training.schedule import cosine_warm_restarts


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=opt_state,
        )


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    t_0: int = 5,
    t_mult: int = 2,
    steps_per_epoch: int = 1,
    caffe_bias_rules: bool = False,
    frozen_prefixes: tuple = (),
) -> optax.GradientTransformation:
    """AdamW + per-epoch cosine warm restarts (train_erp_depth.py:156-162).

    caffe_bias_rules reproduces util.py:147-155 (set_caffe_param_mult):
    bias parameters get 2x the learning rate and zero weight decay.
    frozen_prefixes reproduces util.py:124-130 (freeze_layer): parameters
    whose path starts with any given '/'-joined prefix receive no updates
    (e.g. ("trunk/encoder",) freezes the pretrained backbone).
    """

    def path_str(path):
        return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)

    schedule = cosine_warm_restarts(lr, t_0, t_mult, steps_per_epoch=steps_per_epoch)
    labels_needed = caffe_bias_rules or frozen_prefixes

    if not labels_needed:
        return optax.adamw(schedule, weight_decay=weight_decay)

    def label_of(path, _):
        p = path_str(path)
        if any(p.startswith(pre) for pre in frozen_prefixes):
            return "frozen"
        if caffe_bias_rules and "bias" in (
            path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        ):
            return "bias"
        return "other"

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(label_of, params)

    double = cosine_warm_restarts(2 * lr, t_0, t_mult, steps_per_epoch=steps_per_epoch)
    return optax.multi_transform(
        {
            "frozen": optax.set_to_zero(),
            "bias": optax.adamw(double, weight_decay=0.0),
            "other": optax.adamw(schedule, weight_decay=weight_decay),
        },
        label_fn,
    )


def create_train_state(model, rng, sample_rgb, tx) -> TrainState:
    # jit the init: eager init dispatches thousands of tiny device ops
    variables = jax.jit(lambda: model.init(rng, sample_rgb, train=False))()
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def _forward_loss(model, params, batch_stats, batch, confidence):
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["rgb"],
        train=True,
        confidence=confidence,
        mutable=["batch_stats"],
    )
    preds = out if isinstance(out, (list, tuple)) else [out]
    losses = [berhu_loss(p, batch["depth"], batch["mask"]) for p in preds]
    loss = jnp.mean(jnp.stack(losses))
    return loss, (mutated["batch_stats"], preds[-1])


def make_train_step(
    model,
    confidence: bool = True,
    iterative: bool = False,  # kept for call-site clarity; the loss handles
    donate: bool = True,      # single and multi-prediction models uniformly
) -> Callable:
    """Returns jitted step: (state, batch) -> (state, metrics dict).

    batch: {'rgb': (B,H,W,3), 'depth': (B,H,W,1), 'mask': (B,H,W,1)};
    iterative models return a list of predictions and the loss averages
    BerHu over iterations (train_erp_depth_iterative.py:268-279).
    """
    del iterative

    def step(state: TrainState, batch):
        (loss, (new_stats, pred)), grads = jax.value_and_grad(
            lambda p: _forward_loss(model, p, state.batch_stats, batch, confidence),
            has_aux=True,
        )(state.params)
        state = state.apply_gradients(grads, new_stats)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "pred_mean": jnp.mean(pred),
        }
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, confidence: bool = True, median_scale: bool = True) -> Callable:
    """Returns jitted eval: (params, batch_stats, batch) -> (metrics, N, pred)."""

    def step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["rgb"],
            train=False,
            confidence=confidence,
        )
        pred = out[-1] if isinstance(out, (list, tuple)) else out
        metrics, n = compute_depth_metrics(
            pred, batch["depth"], batch["mask"], median_scale=median_scale
        )
        return metrics, n, pred

    return jax.jit(step)
