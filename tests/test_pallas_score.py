"""Pallas fused score+top-k kernel, interpret mode (compiled-mode parity is
exercised on real TPU by bench/driver runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.ops.pallas_score import fused_score_topk


@pytest.mark.parametrize("variant", ["extract", "insert", "twopass", "twopass3", "twopass3c2", "twopass4", "blockwise", "parblock", "subtile"])
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


@pytest.mark.parametrize("variant", ["extract", "insert", "twopass", "twopass3", "twopass3c2", "twopass4", "blockwise", "parblock", "subtile"])
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


def test_variants_identical():
    """All variants must match the extract baseline bit-for-bit, index order
    (tie semantics) included — pins the twopass cursor extraction's tie order
    against the reference variants, not just value tolerance."""
    rng = np.random.default_rng(3)
    eu = rng.standard_normal((256, 64)).astype(np.float32)
    ei = rng.standard_normal((4096, 64)).astype(np.float32)
    v1, i1 = fused_score_topk(
        jnp.asarray(eu), jnp.asarray(ei), k=20, interpret=True, variant="extract"
    )
    for variant in ("insert", "twopass", "twopass3", "twopass3c2", "twopass4", "twopass4b256", "unroll2", "blockwise", "parblock", "subtile"):
        v2, i2 = fused_score_topk(
            jnp.asarray(eu), jnp.asarray(ei), k=20, interpret=True, variant=variant
        )
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2), err_msg=variant)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2), err_msg=variant)


def test_collect_variant_semantics():
    """The id-collect variant (negative result on this chip: its XLA gather
    postlude is slower than in-kernel value extraction, kept as a documented
    design point): indices must match `lax.top_k` bit-for-bit; values are
    recomputed by a batched d-contraction whose accumulation ORDER may differ
    from the full GEMM's at the LSB on CPU, so they get allclose, not equality."""
    rng = np.random.default_rng(5)
    eu = rng.standard_normal((256, 64)).astype(np.float32)
    ei = rng.standard_normal((4096, 64)).astype(np.float32)
    v1, i1 = fused_score_topk(
        jnp.asarray(eu), jnp.asarray(ei), k=20, interpret=True, variant="extract"
    )
    for variant in ("collect", "collect2"):
        v2, i2 = fused_score_topk(
            jnp.asarray(eu), jnp.asarray(ei), k=20, interpret=True, variant=variant
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2), err_msg=variant)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-5, err_msg=variant
        )
