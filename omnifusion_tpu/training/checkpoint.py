"""Checkpoint save/restore via orbax.

Improves on the reference, which saves only the model state dict per epoch
(train_erp_depth.py:307), destroys previous results on startup
(shutil.rmtree, train_erp_depth.py:76), never persists optimizer state, and
keys its pers2equi grids by mutable names: here the FULL train state
(params, batch stats, optimizer, step) is checkpointed, 'latest' and 'best'
are tracked side by side, and resume is exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _state_tree(self, state) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def save(self, state, name: str = "latest", best: bool = False):
        tree = jax.device_get(self._state_tree(state))
        self._ckpt.save(self._path(name), tree, force=True)
        if best:
            self._ckpt.save(self._path("best"), tree, force=True)

    def restore(self, state, name: str = "latest"):
        """Restore into the structure of ``state`` (same model/optimizer)."""
        template = jax.device_get(self._state_tree(state))
        tree = self._ckpt.restore(self._path(name), item=template)
        return state.replace(
            step=tree["step"],
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
        )

    def restore_variables(self, name: str = "best") -> dict[str, Any]:
        """Restore just model variables (for inference)."""
        tree = self._ckpt.restore(self._path(name))
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    def exists(self, name: str = "latest") -> bool:
        return os.path.exists(self._path(name))
