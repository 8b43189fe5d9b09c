"""ProNE spectral embedding init, TPU-native.

Capability match for `proNE.py` (ProNE: NE as sparse matrix factorization + spectral
propagation): the user-item graph (items offset by n_users, `proNE.py:169-178`) is
factorized into dim-d embeddings, then enhanced by a Chebyshev-Gaussian band-pass
filter.  The scipy/sklearn pipeline becomes edge-list SpMM + on-device randomized SVD:

  pre-factorization (`proNE.py:62-84`): for the 0/1 bipartite adjacency the
  log-transformed PPMI-style matrix has the closed form per edge (u,i):
      F_ui = log(1/deg_u) - log(neg_i),   neg = colsum(rownorm(A))^0.75 / sum
  so F is just a reweighted edge list — factorized by subspace iteration
  (`ops/svd.randomized_svd_operator`) without ever materializing scipy CSR.

  chebyshev_gaussian (`proNE.py:86-120`): with A' = I + A and DA = rownorm(A'),
      M x = (1 - mu) x - DA x,     DA x = (x + A x) / (deg + 1)
  the recursion Lx2 = M(M Lx1) - 2 Lx1 - Lx0 runs as a fixed python loop of
  SpMM + AXPY under one jit; Bessel coefficients iv(i, theta) are host-side
  power-series scalars (no scipy dependency).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.config import ProNEConfig
from serendipity_tpu.data.datasets import Interactions
from serendipity_tpu.graph.adjacency import BipartiteAdjacency, build_normalized_adjacency
from serendipity_tpu.ops.spmm import spmm_edges
from serendipity_tpu.ops.svd import l2_normalize_rows, randomized_svd_operator, svd_tall


def bessel_iv(n: int, s: float, terms: int = 24) -> float:
    """Modified Bessel function of the first kind I_n(s) by power series
    (sum_k (s/2)^(2k+n) / (k! (k+n)!)); replaces `scipy.special.iv`
    (`proNE.py:104-113`).  Converges to machine precision for the small s used."""
    total = 0.0
    for k in range(terms):
        total += (s / 2.0) ** (2 * k + n) / (math.factorial(k) * math.factorial(k + n))
    return total


def _edge_weights_prefactorization(
    adj: BipartiteAdjacency,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-edge F values for both halves (closed form of `proNE.py:62-81`)."""
    deg_u = np.maximum(adj.user_degrees.astype(np.float64), 1)
    deg_i = np.maximum(adj.item_degrees.astype(np.float64), 1)
    e = adj.n_edges

    # colsum of row-normalized A at node v = sum over neighbors n of 1/deg_n
    colsum_i = np.zeros(adj.n_items)
    np.add.at(colsum_i, adj.u_src[:e], 1.0 / deg_u[adj.u_dst[:e]])
    colsum_u = np.zeros(adj.n_users)
    np.add.at(colsum_u, adj.i_src[:e], 1.0 / deg_i[adj.i_dst[:e]])

    pow_i = colsum_i ** 0.75
    pow_u = colsum_u ** 0.75
    total = pow_i.sum() + pow_u.sum()
    neg_i = np.maximum(pow_i / total, 1e-300)
    neg_u = np.maximum(pow_u / total, 1e-300)

    # F_dst,src = log(1/deg_dst) - log(neg_src); the reference clamps values <= 0
    # to 1 before log (`proNE.py:75-79`), which only affects the (positive) neg term
    # when neg >= 1 — impossible after normalization — so the closed form is exact.
    f_u = (-np.log(deg_u[adj.u_dst[:e]]) - np.log(neg_i[adj.u_src[:e]])).astype(np.float32)
    f_i = (-np.log(deg_i[adj.i_dst[:e]]) - np.log(neg_u[adj.i_src[:e]])).astype(np.float32)

    f_u_pad = np.zeros(adj.n_edges_padded, np.float32)
    f_i_pad = np.zeros(adj.n_edges_padded, np.float32)
    f_u_pad[:e] = f_u
    f_i_pad[:e] = f_i
    return f_u_pad, f_i_pad


def _edge_consts(adj: BipartiteAdjacency, f_u: np.ndarray, f_i: np.ndarray):
    """Device pytree for the edge-list (scatter-add) operator pair — the small-graph
    fallback when the hybrid cost model declines (`build_hybrid` returns None)."""
    e = adj.n_edges
    # F^T needs the u-half weights laid out in item-sorted edge order (and vice
    # versa).  Both halves enumerate the same undirected edges; CSR-by-item order is
    # (item, user)-lex, so permuting the u-half arrays by that key aligns them.
    order_ui = np.lexsort((adj.u_dst[:e], adj.u_src[:e]))   # u-half -> (item, user) order
    order_iu = np.lexsort((adj.i_dst[:e], adj.i_src[:e]))   # i-half -> (user, item) order
    fu_by_item = np.zeros(adj.n_edges_padded, np.float32)
    fu_by_item[:e] = f_u[:e][order_ui]
    fi_by_user = np.zeros(adj.n_edges_padded, np.float32)
    fi_by_user[:e] = f_i[:e][order_iu]
    return {
        "u_dst": jnp.asarray(adj.u_dst), "u_src": jnp.asarray(adj.u_src),
        "i_dst": jnp.asarray(adj.i_dst), "i_src": jnp.asarray(adj.i_src),
        "fu": jnp.asarray(f_u), "fi": jnp.asarray(f_i),
        "fu_t": jnp.asarray(fu_by_item), "fi_t": jnp.asarray(fi_by_user),
    }


def _edge_ops(consts, n_u: int, n_i: int):
    """(ui, iu, ui_t, iu_t) closures over edge-list consts (tracer-safe)."""
    def ui(x):
        return spmm_edges(consts["u_dst"], consts["u_src"], consts["fu"], x, n_u)

    def iu(x):
        return spmm_edges(consts["i_dst"], consts["i_src"], consts["fi"], x, n_i)

    def ui_t(y):
        return spmm_edges(consts["i_dst"], consts["i_src"], consts["fu_t"], y, n_i)

    def iu_t(y):
        return spmm_edges(consts["u_dst"], consts["u_src"], consts["fi_t"], y, n_u)

    return ui, iu, ui_t, iu_t


def _hybrid_ops(consts, n_u: int, n_i: int):
    from serendipity_tpu.ops.spmm_hybrid import bind_hybrid, bind_hybrid_transposed

    ui, iu = bind_hybrid(consts, n_u, n_i)
    ui_t, iu_t = bind_hybrid_transposed(consts, n_u, n_i)
    return ui, iu, ui_t, iu_t


def _build_f_operator(inter, adj, f_u, f_i, head_k=None):
    """(consts, bind) for the pre-factorization operator F.

    DEFAULT: the edge-list (gather + segment-sum) operators.  Measured round 4
    (gowalla scale, docs/DESIGN.md §8): once the whole pre-factorization runs as
    one cached jit, the edge path is 1.6 s warm / 27 s cold vs the hybrid
    dense-head layout's 9.8 s / 386 s — ProNE applies F to [N, dim+oversample]
    blocks where XLA's row gather amortizes over ~80 columns, while the hybrid's
    two non-symmetric float32 [K, n_users] dense blocks cost GB-scale HBM
    streams, transfers, and compile time.  (The hybrid layout stays the clear
    winner for TRAINING propagation, where it replaced a per-step gather bound —
    DESIGN.md §7b.)  Pass head_k > 0 to force the hybrid operators; dense blocks
    then stay float32 because ProNE feeds downstream SVDs where bf16 rounding
    costs real spectral accuracy."""
    if head_k is not None and head_k > 0:
        from serendipity_tpu.ops.spmm_hybrid import build_hybrid, hybrid_consts

        e = adj.n_edges
        layout = build_hybrid(
            inter, f_u[:e], f_i[:e], head_k=head_k, dense_dtype=jnp.float32
        )
        if layout is not None:
            return hybrid_consts(layout), _hybrid_ops
    return _edge_consts(adj, f_u, f_i), _edge_ops


from functools import partial


@partial(
    jax.jit,
    static_argnames=("bind", "n_u", "n_i", "dim", "n_iter", "oversample", "shard"),
)
def _prefactor_jit(key, consts, *, bind, n_u, n_i, dim, n_iter, oversample,
                   shard=None):
    """Whole pre-factorization as ONE module-level jit: eager op-by-op subspace
    iteration costs one tunnel RPC per primitive (seconds of relay overhead),
    and a per-call inner jit would recompile every invocation.  Operator consts
    enter as arguments, never closure constants (`ops/spmm_common`)."""
    ui, iu, ui_t, iu_t = bind(consts, n_u, n_i)

    def _c(x):
        # GSPMD row-sharding of the [N, k] iterates over the mesh (mesh path):
        # XLA inserts the gather/scatter collectives around the edge-list SpMMs
        # and keeps the small k x k factorizations replicated
        return x if shard is None else jax.lax.with_sharding_constraint(x, shard)

    # stacked-node operator: x = [x_users; x_items]
    def matvec_f(x):
        return _c(jnp.concatenate([ui(x[n_u:]), iu(x[:n_u])], axis=0))

    def rmatvec_f(y):
        # (F^T y)_u = sum_i F_iu y_i ; (F^T y)_i = sum_u F_ui y_u
        return _c(jnp.concatenate([iu_t(y[n_u:]), ui_t(y[:n_u])], axis=0))

    u0, s0 = randomized_svd_operator(
        key, matvec_f, rmatvec_f, n_u + n_i, n_u + n_i, dim,
        n_iter=n_iter, oversample=oversample,
    )
    return l2_normalize_rows(u0 * jnp.sqrt(jnp.maximum(s0, 0.0)))  # `proNE.py:44-45`


@partial(
    jax.jit,
    static_argnames=("bind", "n_u", "n_i", "order", "mu", "s", "dim", "shard"),
)
def _chebyshev_jit(a, deg1, consts, *, bind, n_u, n_i, order, mu, s, dim,
                   shard=None):
    if order == 1:
        return a
    bessels = [bessel_iv(i, s) for i in range(max(order, 2))]
    ui, iu, _, _ = bind(consts, n_u, n_i)

    def adj_mv(x):
        y = jnp.concatenate([ui(x[n_u:]), iu(x[:n_u])], axis=0)
        return y if shard is None else jax.lax.with_sharding_constraint(y, shard)

    def m_mv(x):
        # M x = (1 - mu) x - DA x,  DA = rownorm(I + A)
        return (1.0 - mu) * x - (x + adj_mv(x)) / deg1

    lx0 = a
    lx1 = m_mv(a)
    lx1 = 0.5 * m_mv(lx1) - a
    conv = bessels[0] * lx0 - 2.0 * bessels[1] * lx1
    for i in range(2, order):
        lx2 = m_mv(m_mv(lx1)) - 2.0 * lx1 - lx0
        sign = 1.0 if i % 2 == 0 else -1.0
        conv = conv + sign * 2.0 * bessels[i] * lx2
        lx0, lx1 = lx1, lx2
    delta = a - conv
    mm = delta + adj_mv(delta)        # (I + A)(a - conv), `proNE.py:118`
    u, sv = svd_tall(mm, dim)
    return l2_normalize_rows(u * jnp.sqrt(jnp.maximum(sv, 0.0)))


def prone_embeddings(
    inter: Interactions,
    cfg: ProNEConfig,
    seed: int = 0,
    adj: BipartiteAdjacency | None = None,
    head_k: int | None = None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full ProNE pipeline -> (emb_user [U,d], emb_item [I,d]), l2-normalized rows.

    With `mesh`, the [N, dim+oversample] subspace iterates and Chebyshev states
    row-shard over all devices (GSPMD; the batched Chebyshev-filtered SpMM of
    SURVEY §2's TPU-native list) — the small k x k Gram/Cholesky factors stay
    replicated.  Results equal the single-device path up to float association."""
    if adj is None:
        adj = build_normalized_adjacency(inter)
    n_u, n_i = adj.n_users, adj.n_items
    f_u, f_i = _edge_weights_prefactorization(adj)

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(tuple(mesh.axis_names), None))

    consts_f, bind_f = _build_f_operator(inter, adj, f_u, f_i, head_k=head_k)
    features = _prefactor_jit(
        jax.random.PRNGKey(seed), consts_f, bind=bind_f, n_u=n_u, n_i=n_i,
        dim=cfg.dim, n_iter=cfg.svd_iters, oversample=cfg.svd_oversample,
        shard=shard,
    )

    emb = _chebyshev_gaussian(
        features, inter, adj, cfg.order, cfg.mu, cfg.theta, cfg.dim,
        head_k=head_k, shard=shard,
    )
    emb = np.asarray(emb)
    return emb[:n_u], emb[n_u:]


def _chebyshev_gaussian(a, inter, adj: BipartiteAdjacency, order, mu, s, dim,
                        head_k=None, shard=None):
    from serendipity_tpu.ops.spmm_hybrid import build_hybrid, hybrid_consts

    n_u, n_i = adj.n_users, adj.n_items
    e = adj.n_edges
    layout = None
    if head_k is not None and head_k > 0:   # opt-in, like _build_f_operator
        ones = np.ones(e, np.float32)
        layout = build_hybrid(
            inter, ones, ones, head_k=head_k, dense_dtype=jnp.float32
        )
    if layout is not None:
        consts, bind = hybrid_consts(layout), _hybrid_ops
    else:
        ones_pad = (np.arange(adj.n_edges_padded) < e).astype(np.float32)
        consts, bind = _edge_consts(adj, ones_pad, ones_pad), _edge_ops
    deg1 = jnp.asarray(
        np.concatenate([adj.user_degrees, adj.item_degrees]).astype(np.float32) + 1.0
    )[:, None]
    return _chebyshev_jit(
        a, deg1, consts, bind=bind, n_u=n_u, n_i=n_i,
        order=order, mu=mu, s=s, dim=dim, shard=shard,
    )
