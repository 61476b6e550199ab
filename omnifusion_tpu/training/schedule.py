"""LR schedules.

cosine_warm_restarts reproduces torch CosineAnnealingWarmRestarts as used by
the reference trainers (train_erp_depth.py:162: T_0=5, T_mult=2, stepped once
per epoch) as a per-step optax schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(
    base_lr: float,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
    steps_per_epoch: int = 1,
):
    """Per-step schedule; the epoch index advances every steps_per_epoch.

    lr(e) = eta_min + (base - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2
    with T_i = t_0 * t_mult^i and T_cur the epochs since the last restart.
    """
    assert t_mult >= 1

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t_0)
            t_i = float(t_0)
        else:
            # cycle index i satisfies: t_0*(m^i - 1)/(m - 1) <= epoch
            m = float(t_mult)
            i = jnp.floor(jnp.log(epoch / t_0 * (m - 1.0) + 1.0) / jnp.log(m))
            start = t_0 * (jnp.power(m, i) - 1.0) / (m - 1.0)
            t_i = t_0 * jnp.power(m, i)
            t_cur = epoch - start
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule
