"""Test harness: force the CPU backend with 8 virtual devices so sharding/collective
code paths run without TPU hardware (SURVEY.md §4 test strategy).

Note: this environment preloads jax at interpreter start (sitecustomize) with
JAX_PLATFORMS baked into jax.config, so plain env vars are too late here — we must
update jax.config directly (backends are not instantiated until first use, so this
still takes effect).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MLLS = "/root/reference/LightGCN-tf/Data/mlls"


@pytest.fixture(scope="session")
def mlls():
    """The bundled MovieLens-latest-small fixture (608 users / 2120 items)."""
    from serendipity_tpu.data import load_adjacency_list

    if not os.path.isdir(REFERENCE_MLLS):
        pytest.skip("mlls fixture not available")
    return load_adjacency_list(REFERENCE_MLLS)


@pytest.fixture(scope="session")
def tiny_inter():
    """Small random bipartite dataset for fast unit tests."""
    from serendipity_tpu.data import interactions_from_arrays

    rng = np.random.default_rng(0)
    n_users, n_items, nnz = 50, 80, 600
    u = rng.integers(0, n_users, nnz)
    i = rng.integers(0, n_items, nnz)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    # per-user 80/20 split, at least 1 test item for users with >=2 items
    tr_u, tr_i, te_u, te_i = [], [], [], []
    for uu in range(n_users):
        its = pairs[pairs[:, 0] == uu][:, 1]
        if len(its) == 0:
            continue
        k = max(1, int(0.8 * len(its)))
        tr_u += [uu] * k
        tr_i += list(its[:k])
        te_u += [uu] * (len(its) - k)
        te_i += list(its[k:])
    return interactions_from_arrays(
        np.array(tr_u), np.array(tr_i), np.array(te_u), np.array(te_i),
        n_users=n_users, n_items=n_items,
    )
