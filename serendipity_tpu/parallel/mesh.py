"""Device mesh construction and sharding helpers.

Green-field subsystem (the reference is single-process single-device; SURVEY.md §2):
a 2-D `data` x `model` mesh where

  * `data`  shards training batches and evaluation user-batches (DP),
  * `model` shards embedding-table rows and the item axis of retrieval (the
    embedding-parallel analog of TP for this workload class).

Collectives are inserted by XLA from `NamedSharding` annotations (GSPMD) for the
training step, and written explicitly with `shard_map` + `psum`/`all_gather` where
control matters (sharded top-k merge, `parallel/retrieval.py`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a data x model mesh.  n_data=0 -> use all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devs) // max(n_model, 1)
    n = n_data * n_model
    grid = np.array(devs[:n]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def shard_rows(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Rows sharded over `axis`, feature dim replicated (embedding tables)."""
    return NamedSharding(mesh, P(axis, None))


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows_to_multiple(x: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading dim so row-sharding divides evenly; pad rows are zeros."""
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    pad = np.zeros((target - n,) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)
