"""ProNE parity tests against a direct numpy/scipy implementation of the reference
algorithm semantics (`proNE.py:37-120`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from serendipity_tpu.config import ProNEConfig
from serendipity_tpu.graph import build_normalized_adjacency
from serendipity_tpu.models.prone import (
    _chebyshev_gaussian,
    _edge_weights_prefactorization,
    bessel_iv,
    prone_embeddings,
)
from serendipity_tpu.ops.svd import randomized_svd_operator, svd_tall


def _dense_adj(adj):
    n = adj.n_users + adj.n_items
    a = np.zeros((n, n))
    e = adj.n_edges
    a[adj.u_dst[:e], adj.u_src[:e] + adj.n_users] = 1.0
    a[adj.i_dst[:e] + adj.n_users, adj.i_src[:e]] = 1.0
    return a


def _reference_prefactorization_dense(a):
    """Transliteration of `proNE.py:62-81` on a dense 0/1 matrix."""
    rowsum = a.sum(1, keepdims=True)
    c1 = np.divide(a, rowsum, out=np.zeros_like(a), where=rowsum > 0)
    neg = c1.sum(0) ** 0.75
    neg = neg / neg.sum()
    negm = a * neg[None, :]
    logc1 = np.where(a > 0, np.log(np.where(c1 > 0, c1, 1.0)), 0.0)
    logneg = np.where(a > 0, np.log(np.where(negm > 0, negm, 1.0)), 0.0)
    return logc1 - logneg


def test_bessel_iv():
    scipy_special = pytest.importorskip("scipy.special")
    for n in range(12):
        for s in (0.2, 0.5, 1.0):
            assert bessel_iv(n, s) == pytest.approx(float(scipy_special.iv(n, s)), rel=1e-10)


def test_prefactorization_edge_weights(tiny_inter):
    adj = build_normalized_adjacency(tiny_inter)
    f_u, f_i = _edge_weights_prefactorization(adj)
    a = _dense_adj(adj)
    f_ref = _reference_prefactorization_dense(a)
    e = adj.n_edges
    got_u = np.asarray(f_u[:e])
    ref_u = f_ref[adj.u_dst[:e], adj.u_src[:e] + adj.n_users]
    np.testing.assert_allclose(got_u, ref_u, rtol=1e-5)
    got_i = np.asarray(f_i[:e])
    ref_i = f_ref[adj.i_dst[:e] + adj.n_users, adj.i_src[:e]]
    np.testing.assert_allclose(got_i, ref_i, rtol=1e-5)


def test_randomized_svd_operator():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((120, 90)).astype(np.float32)
    import jax

    u, s = randomized_svd_operator(
        jax.random.PRNGKey(1),
        lambda x: jnp.asarray(a) @ x,
        lambda y: jnp.asarray(a.T) @ y,
        120, 90, dim=10, n_iter=8,
    )
    s_ref = np.linalg.svd(a, compute_uv=False)[:10]
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-3)
    # subspace agreement: projector difference small
    u_ref = np.linalg.svd(a)[0][:, :10]
    p_got = np.asarray(u) @ np.asarray(u).T
    p_ref = u_ref @ u_ref.T
    assert np.abs(p_got - p_ref).max() < 1e-2


def test_cholqr2_ill_conditioned_fallback():
    """CholeskyQR2 must stay orthonormal on blocks past the f32 breakdown point
    (cond(Y) >~ 3e3) via the per-round Householder fallback (ADVICE r4 medium)."""
    from serendipity_tpu.ops.svd import orthonormalize_cholqr2

    rng = np.random.default_rng(3)
    base = rng.standard_normal((400, 24)).astype(np.float32)
    # nearly collinear columns: cond(Y) ~ 1e5 (Gram cond ~ 1e10, far past f32)
    y = base.copy()
    y[:, 1:] = y[:, :1] + 1e-5 * y[:, 1:]
    q = np.asarray(orthonormalize_cholqr2(jnp.asarray(y)))
    g = q.T @ q
    assert np.abs(g - np.eye(24)).max() < 1e-3
    # and the well-conditioned path is untouched
    q2 = np.asarray(orthonormalize_cholqr2(jnp.asarray(base)))
    assert np.abs(q2.T @ q2 - np.eye(24)).max() < 1e-5


def test_svd_tall():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((200, 16)).astype(np.float32)
    u, s = svd_tall(jnp.asarray(m), 16)
    s_ref = np.linalg.svd(m, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4)


def test_chebyshev_matches_reference_dense(tiny_inter):
    """Deterministic half of ProNE: same input features -> same output embedding
    (up to per-column sign from SVD)."""
    adj = build_normalized_adjacency(tiny_inter)
    a = _dense_adj(adj)
    n = a.shape[0]
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    order, mu, s, dim = 10, 0.2, 0.5, 8

    got = np.asarray(
        _chebyshev_gaussian(jnp.asarray(feats), tiny_inter, adj, order, mu, s, dim)
    )

    # numpy transliteration of `proNE.py:86-120`
    a1 = np.eye(n) + a
    da = a1 / a1.sum(1, keepdims=True)
    lap = np.eye(n) - da
    m = lap - mu * np.eye(n)
    lx0 = feats.astype(np.float64)
    lx1 = m @ lx0
    lx1 = 0.5 * m @ lx1 - lx0
    conv = bessel_iv(0, s) * lx0 - 2 * bessel_iv(1, s) * lx1
    for i in range(2, order):
        lx2 = m @ (m @ lx1) - 2 * lx1 - lx0
        conv = conv + (1 if i % 2 == 0 else -1) * 2 * bessel_iv(i, s) * lx2
        lx0, lx1 = lx1, lx2
    mm = a1 @ (lx0 * 0 + (feats - conv))
    u_ref, s_ref, _ = np.linalg.svd(mm, full_matrices=False)
    emb_ref = u_ref[:, :dim] * np.sqrt(s_ref[:dim])
    emb_ref /= np.maximum(np.linalg.norm(emb_ref, axis=1, keepdims=True), 1e-12)

    # match up to per-column sign
    for c in range(dim):
        col = got[:, c]
        ref = emb_ref[:, c]
        err = min(np.abs(col - ref).max(), np.abs(col + ref).max())
        assert err < 5e-3, f"column {c} mismatch {err}"


def test_prone_end_to_end(tiny_inter):
    cfg = ProNEConfig(dim=16)
    emb_u, emb_i = prone_embeddings(tiny_inter, cfg, seed=0)
    assert emb_u.shape == (tiny_inter.n_users, 16)
    assert emb_i.shape == (tiny_inter.n_items, 16)
    assert np.isfinite(emb_u).all() and np.isfinite(emb_i).all()
    norms = np.linalg.norm(emb_u, axis=1)
    np.testing.assert_allclose(norms[norms > 1e-6], 1.0, rtol=1e-4)


def test_prone_hybrid_matches_edge_path(tiny_inter):
    """Forcing the hybrid dense-head/ELL-tail operators (head_k) must reproduce
    the edge-list fallback (the default on this tiny graph) up to float
    association and per-column SVD sign."""
    cfg = ProNEConfig(dim=8)
    eu_a, ei_a = prone_embeddings(tiny_inter, cfg, seed=3)
    eu_b, ei_b = prone_embeddings(tiny_inter, cfg, seed=3, head_k=64)
    for a, b in ((eu_a, eu_b), (ei_a, ei_b)):
        sign = np.sign(np.sum(a * b, axis=0))
        sign[sign == 0] = 1.0
        np.testing.assert_allclose(a, b * sign[None, :], atol=5e-3)


def test_prone_mesh_sharded_matches_single():
    """GSPMD row-sharded ProNE (iterates over the 8-device mesh) must match the
    single-device path up to float association and per-column SVD sign."""
    import jax

    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    inter = synthetic_interactions(96, 120, avg_degree=10, seed=1)
    cfg = ProNEConfig(dim=8)
    eu_a, ei_a = prone_embeddings(inter, cfg, seed=2)
    eu_b, ei_b = prone_embeddings(inter, cfg, seed=2, mesh=make_mesh(4, 2))
    for a, b in ((eu_a, eu_b), (ei_a, ei_b)):
        sign = np.sign(np.sum(a * b, axis=0))
        sign[sign == 0] = 1.0
        np.testing.assert_allclose(a, b * sign[None, :], atol=5e-3)
