"""Pallas fused score+top-k kernel, interpret mode (compiled-mode parity is
exercised on real TPU by bench/driver runs).

Covers the LIVE variants only (twopass4 default, its block-size form, and the
small-catalog insert path); the retired design-space variants are archived
without test coverage in `ops/pallas_score_museum.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.ops.pallas_score import fused_score_topk

LIVE_VARIANTS = ["insert", "twopass4", "twopass4b256"]


@pytest.mark.parametrize("variant", LIVE_VARIANTS)
@pytest.mark.parametrize("u,n,k", [(256, 1024, 20), (512, 2048, 10)])
def test_fused_score_topk_exact(u, n, k, variant):
    rng = np.random.default_rng(0)
    eu = rng.standard_normal((u, 64)).astype(np.float32)
    ei = rng.standard_normal((n, 64)).astype(np.float32)
    v, i = fused_score_topk(
        jnp.asarray(eu), jnp.asarray(ei), k=k, interpret=True, variant=variant
    )
    s = eu @ ei.T
    ref = np.sort(s, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.asarray(v), ref, rtol=1e-4, atol=1e-4)
    got = np.take_along_axis(s, np.asarray(i), axis=1)
    np.testing.assert_allclose(np.sort(got, 1), np.sort(ref, 1), rtol=1e-4, atol=1e-4)
    # descending order
    assert (np.diff(np.asarray(v), axis=1) <= 1e-6).all()


@pytest.mark.parametrize("variant", LIVE_VARIANTS)
def test_fused_score_topk_ties(variant):
    """Position-indexed masking must return distinct indices even with ties."""
    u, n, k = 256, 512, 8
    eu = np.ones((u, 64), np.float32)
    ei = np.ones((n, 64), np.float32)          # all scores identical
    v, i = fused_score_topk(
        jnp.asarray(eu), jnp.asarray(ei), k=k, interpret=True, variant=variant
    )
    i = np.asarray(i)
    for r in range(0, u, 37):
        assert len(set(i[r].tolist())) == k


def test_live_variants_match_lax_topk_bitwise():
    """Live variants must match `lax.top_k` bit-for-bit, index order (tie
    semantics) included — the kernels' position-indexed masking is designed to
    reproduce `lax.top_k` exactly, and downstream eval memoization relies on
    variant-independent outputs."""
    rng = np.random.default_rng(3)
    eu = rng.standard_normal((256, 64)).astype(np.float32)
    ei = rng.standard_normal((4096, 64)).astype(np.float32)
    s = jax.lax.dot_general(
        jnp.asarray(eu), jnp.asarray(ei), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    v1, i1 = jax.lax.top_k(s, 20)
    for variant in LIVE_VARIANTS:
        v2, i2 = fused_score_topk(
            jnp.asarray(eu), jnp.asarray(ei), k=20, interpret=True, variant=variant
        )
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2), err_msg=variant)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2), err_msg=variant)


def test_museum_dispatch_still_routes():
    """Museum variant names keep working through the lazy dispatch (probe
    scripts use them); one cheap shape, one variant — the archive itself is
    deliberately untested."""
    rng = np.random.default_rng(5)
    eu = rng.standard_normal((256, 64)).astype(np.float32)
    ei = rng.standard_normal((2048, 64)).astype(np.float32)
    v1, i1 = fused_score_topk(
        jnp.asarray(eu), jnp.asarray(ei), k=10, interpret=True, variant="twopass4"
    )
    v2, i2 = fused_score_topk(
        jnp.asarray(eu), jnp.asarray(ei), k=10, interpret=True, variant="extract"
    )
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
