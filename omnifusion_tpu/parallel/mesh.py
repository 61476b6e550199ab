"""Device-mesh parallelism utilities.

The reference's entire distribution story is single-process
``nn.DataParallel`` + threaded SyncBN (SURVEY.md §2.6).  The TPU-native
equivalent is SPMD over a ``jax.sharding.Mesh``:

  - ``data`` axis: batch sharding (DP).  Gradients and BatchNorm batch
    statistics become global automatically under GSPMD — a ``jnp.mean`` over
    a sharded batch axis IS the cross-replica mean, so SyncBN semantics
    (sync_batchnorm/batchnorm.py:74-145) come for free, with XLA choosing
    psum/all-reduce placement over ICI.
  - ``model`` axis: shards the tangent-patch axis (the dominant compute
    axis, P in {10,18,26,46}).  The per-patch CNN trunk runs fully sharded;
    GSPMD inserts one tiny all-gather of the <=46 patch tokens before the
    global transformer (SURVEY.md §2.6 "sequence parallel" row).

Use ``with jax.set_mesh(make_mesh(...)):`` around jit calls;
``constrain`` is a no-op outside a mesh context so all model code runs
unchanged on a single device.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh shape data={n_data} x model={n_model} needs "
            f"{n_data * n_model} devices but {len(devices)} are available "
            f"(platform={jax.default_backend()!r}). On CPU, set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N before jax "
            "initializes (see tests/conftest.py)."
        )
    return jax.make_mesh(
        (n_data, n_model),
        (DATA_AXIS, MODEL_AXIS),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
        devices=devices,
    )


def _in_mesh_context() -> bool:
    mesh = jax.sharding.get_abstract_mesh()
    return bool(getattr(mesh, "axis_names", ()))


def constrain(x, *axes):
    """with_sharding_constraint(P(*axes)) if inside a mesh context, else x.

    Axis entries may be None (replicated dim), an axis name, or a tuple of
    axis names.  Trailing dims are implicitly replicated.
    """
    if not _in_mesh_context():
        return x
    mesh_axes = jax.sharding.get_abstract_mesh().axis_names
    clean = tuple(a if a is None or _axes_subset(a, mesh_axes) else None for a in axes)
    return jax.lax.with_sharding_constraint(x, P(*clean))


def _axes_subset(a, mesh_axes) -> bool:
    names = a if isinstance(a, tuple) else (a,)
    return all(n in mesh_axes for n in names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
