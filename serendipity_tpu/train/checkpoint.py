"""Sharding-aware checkpoint/resume via Orbax.

Replaces the reference's `torch.save(state_dict)` / `tf.train.Saver` best-snapshot
scheme (`lightGCN/.../main.py:93`, `LightGCN.py:471-478,698-700`) with Orbax
checkpoints of the full train state (params, Adam moments, PRNG key, progress
counters).  Sharded tables restore with their shardings when a mesh is live.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _state_tree(state) -> Dict[str, Any]:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "key": state.key,
        "meta": {
            "epoch": np.asarray(state.epoch),
            "best_metric": np.asarray(state.best_metric),
            "best_epoch": np.asarray(state.best_epoch),
            "stopping_step": np.asarray(state.stopping_step),
        },
    }


def save_checkpoint(path: str, state, keep: int = 1) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(state.epoch, args=ocp.args.StandardSave(_state_tree(state)))
    return os.path.join(path, str(state.epoch))


def restore_checkpoint(path: str, state, step: Optional[int] = None):
    """Restore into a template TrainState (shapes/shardings from its live arrays)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        template = jax.tree.map(lambda x: x, _state_tree(state))
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    state.params = restored["params"]
    state.opt_state = restored["opt_state"]
    state.key = restored["key"]
    meta = restored["meta"]
    state.epoch = int(meta["epoch"])
    state.best_metric = float(meta["best_metric"])
    state.best_epoch = int(meta["best_epoch"])
    state.stopping_step = int(meta["stopping_step"])
    return state
