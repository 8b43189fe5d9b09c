"""Graph-convolutional embedding models (LightGCN family + MF), functional JAX style.

Capabilities of the two reference trainers:
  * PyTorch LightGCN / PureMF (`code/model.py:41-220`),
  * TF LightGCN with NGCF / GCN / GCMC layer variants (`LightGCN-tf/LightGCN.py:232-340`).

Params are a flat dict of arrays (pure pytree) so the same step function works under
`jit`, `shard_map`, and optax without a module framework in the hot path.  Propagation
is the shared bipartite SpMM (`serendipity_tpu.ops.spmm`); arch differences are thin
combinator layers on top of it:

  lightgcn : x_{k+1} = A_hat x_k ; output mean(x_0..x_K)            (`model.py:145-177`)
  mf       : no propagation, raw tables                              (`model.py:41-84`)
  ngcf     : x_{k+1} = LeakyReLU((A+I)x W1 + (A x ⊙ x) W2); concat   (`LightGCN.py:255-293`)
  gcn      : x_{k+1} = LeakyReLU((A+I) x W); concat                  (`LightGCN.py:296-316`)
  gcmc     : x_{k+1} = LeakyReLU(A x W) -> dense; concat             (`LightGCN.py:318-340`)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from serendipity_tpu.config import ModelConfig
from serendipity_tpu.ops.spmm import lightgcn_propagate, spmm_edges

Params = Dict[str, jnp.ndarray]


def _leaky_relu(x):
    # TF default alpha=0.2 (`tf.nn.leaky_relu`), vs jax's 0.01 — parity-sensitive
    return jax.nn.leaky_relu(x, negative_slope=0.2)


@dataclass(frozen=True)
class EmbeddingModel:
    """Static model definition; propagation state lives in the adjacency arrays."""

    arch: str
    n_users: int
    n_items: int
    embed_dim: int
    n_layers: int
    edge_dropout: float = 0.0
    # per-layer output dropout for the weighted variants (`mess_dropout`,
    # `LightGCN.py:287,311,334`); ignored by lightgcn/mf
    mess_dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    def propagate(
        self,
        params: Params,
        adj: Dict[str, jnp.ndarray],
        dropout_key: Optional[jax.Array] = None,
        spmm_ops=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Return final (all_users, all_items) embeddings.

        `spmm_ops` = (user<-items op, item<-users op) closures from
        `ops/spmm_ell.make_bipartite_spmm`: the scatter-free fast path, usable
        whenever edge dropout is off (the layouts bake the weights)."""
        ue = params["user_embedding"].astype(self.compute_dtype)
        ie = params["item_embedding"].astype(self.compute_dtype)
        if self.arch == "mf":
            return ue, ie

        edge_keep = None
        if dropout_key is not None and self.edge_dropout > 0.0:
            keep_prob = 1.0 - self.edge_dropout
            keep = jax.random.bernoulli(
                dropout_key, keep_prob, shape=adj["u_w"].shape
            )
            edge_keep = keep.astype(self.compute_dtype) / keep_prob

        self_u = adj.get("self_u")  # adj_type="norm" diagonal, else None
        self_i = adj.get("self_i")
        if self.arch == "lightgcn":
            if spmm_ops is not None and edge_keep is None and not isinstance(spmm_ops, tuple):
                # joint-graph form: one SpMM per layer over the stacked
                # [user; item] table (`ops/spmm_ell.make_joint_spmm`)
                x = jnp.concatenate([ue, ie], axis=0)
                selfw = None
                if self_u is not None:
                    selfw = jnp.concatenate([self_u, self_i])[:, None]
                acc, cur = x, x
                for _ in range(self.n_layers):
                    nxt = spmm_ops(cur)
                    if selfw is not None:
                        nxt = nxt + selfw * cur
                    cur = nxt
                    acc = acc + cur
                inv = 1.0 / (self.n_layers + 1)
                acc = acc * inv
                return acc[: self.n_users], acc[self.n_users:]
            if spmm_ops is not None and edge_keep is None:
                ui_op, iu_op = spmm_ops
                u_acc, i_acc = ue, ie
                u_cur, i_cur = ue, ie
                for _ in range(self.n_layers):
                    u_nxt, i_nxt = ui_op(i_cur), iu_op(u_cur)
                    if self_u is not None:
                        u_nxt = u_nxt + self_u[:, None] * u_cur
                        i_nxt = i_nxt + self_i[:, None] * i_cur
                    u_cur, i_cur = u_nxt, i_nxt
                    u_acc = u_acc + u_cur
                    i_acc = i_acc + i_cur
                inv = 1.0 / (self.n_layers + 1)
                return u_acc * inv, i_acc * inv
            return lightgcn_propagate(
                ue, ie,
                adj["u_dst"], adj["u_src"], adj["u_w"],
                adj["i_dst"], adj["i_src"], adj["i_w"],
                self.n_layers,
                edge_keep=edge_keep,
                self_u=self_u, self_i=self_i,
            )
        if self.arch in ("ngcf", "gcn", "gcmc"):
            return self._propagate_weighted(params, adj, edge_keep, dropout_key)
        raise ValueError(f"unknown arch {self.arch!r}")

    def _propagate_weighted(
        self,
        params: Params,
        adj: Dict[str, jnp.ndarray],
        edge_keep: Optional[jnp.ndarray],
        dropout_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """NGCF / GCN / GCMC variants: per-layer weight matrices, concat outputs.

        Follows `LightGCN-tf/LightGCN.py:255-340`: each layer applies the propagated
        neighborhood through learned weights + LeakyReLU; the final representation is
        the concatenation of all layer outputs (l2-normalized per layer for NGCF,
        mirroring `tf.math.l2_normalize` at `LightGCN.py:290`).
        """
        u_w, i_w = adj["u_w"], adj["i_w"]
        if edge_keep is not None:
            u_w = u_w * edge_keep
            i_w = i_w * edge_keep
        ue = params["user_embedding"].astype(self.compute_dtype)
        ie = params["item_embedding"].astype(self.compute_dtype)

        def l2norm(x):
            # exactly tf.math.l2_normalize: x * rsqrt(max(sum(x^2), 1e-12)).  The
            # rsqrt(max(...)) form is also what keeps gradients finite on all-zero
            # rows (zero-train-degree nodes), where x/||x|| backprops NaN.
            sq = jnp.sum(jnp.square(x), axis=1, keepdims=True)
            return x * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))

        def mess_drop(x, key, k, half):
            # message dropout on layer outputs (`mess_dropout`; present but commented
            # out in the reference variants, `LightGCN.py:283,311,334` — default 0)
            if key is None or self.mess_dropout <= 0.0:
                return x
            kp = 1.0 - self.mess_dropout
            kk = jax.random.fold_in(jax.random.fold_in(key, k), half)
            return x * jax.random.bernoulli(kk, kp, x.shape) / kp

        self_u, self_i = adj.get("self_u"), adj.get("self_i")
        # gcmc collects only the per-layer MLP outputs — no ego term
        # (`LightGCN.py:328`: all_embeddings = [])
        u_outs, i_outs = ([], []) if self.arch == "gcmc" else ([ue], [ie])
        u_cur, i_cur = ue, ie
        for k in range(self.n_layers):
            w1 = params[f"w_gc_{k}"].astype(self.compute_dtype)
            b1 = params[f"b_gc_{k}"].astype(self.compute_dtype)
            # side = A_hat @ ego; any self-contribution comes from the adjacency
            # itself (adj_type="norm" diagonal), exactly as in the TF variants
            u_side = spmm_edges(adj["u_dst"], adj["u_src"], u_w, i_cur, self.n_users)
            i_side = spmm_edges(adj["i_dst"], adj["i_src"], i_w, u_cur, self.n_items)
            if self_u is not None:
                u_side = u_side + self_u[:, None] * u_cur
                i_side = i_side + self_i[:, None] * i_cur
            if self.arch == "gcmc":
                # conv layer then dense layer; conv output is carried forward,
                # the dense output is what gets collected (`LightGCN.py:318-340`)
                u_cur = _leaky_relu(u_side @ w1 + b1)
                i_cur = _leaky_relu(i_side @ w1 + b1)
                wm = params[f"w_mlp_{k}"].astype(self.compute_dtype)
                bm = params[f"b_mlp_{k}"].astype(self.compute_dtype)
                u_outs.append(mess_drop(u_cur @ wm + bm, dropout_key, k, 0))
                i_outs.append(mess_drop(i_cur @ wm + bm, dropout_key, k, 1))
            elif self.arch == "gcn":
                # emb = LeakyReLU((A_hat emb) W + b), collected as-is
                # (`LightGCN.py:296-316`)
                u_cur = mess_drop(_leaky_relu(u_side @ w1 + b1), dropout_key, k, 0)
                i_cur = mess_drop(_leaky_relu(i_side @ w1 + b1), dropout_key, k, 1)
                u_outs.append(u_cur)
                i_outs.append(i_cur)
            else:  # ngcf (`LightGCN.py:255-293`)
                w2 = params[f"w_bi_{k}"].astype(self.compute_dtype)
                b2 = params[f"b_bi_{k}"].astype(self.compute_dtype)
                u_sum = _leaky_relu(u_side @ w1 + b1)
                i_sum = _leaky_relu(i_side @ w1 + b1)
                u_bi = _leaky_relu((u_cur * u_side) @ w2 + b2)
                i_bi = _leaky_relu((i_cur * i_side) @ w2 + b2)
                # the UNnormalized ego is carried; the l2-normalized copy is
                # what gets collected (`LightGCN.py:281-290`)
                u_cur = mess_drop(u_sum + u_bi, dropout_key, k, 0)
                i_cur = mess_drop(i_sum + i_bi, dropout_key, k, 1)
                u_outs.append(l2norm(u_cur))
                i_outs.append(l2norm(i_cur))
        return jnp.concatenate(u_outs, axis=1), jnp.concatenate(i_outs, axis=1)

    def bpr_loss(
        self,
        params: Params,
        adj: Dict[str, jnp.ndarray],
        users: jnp.ndarray,
        pos: jnp.ndarray,
        neg: jnp.ndarray,
        l2_decay: float,
        dropout_key: Optional[jax.Array] = None,
        spmm_ops=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Softplus BPR + L2 on the ego (pre-propagation) embeddings.

        Matches `model.bpr_loss` (`model.py:196-209`) / TF `create_bpr_loss`
        (`LightGCN.py:342-357`): loss = mean softplus(neg - pos) +
        decay * (|u0|^2 + |p0|^2 + |n0|^2) / (2 * batch).
        """
        all_u, all_i = self.propagate(params, adj, dropout_key, spmm_ops=spmm_ops)
        ue = all_u[users]
        pe = all_i[pos]
        ne = all_i[neg]
        pos_scores = jnp.sum(ue * pe, axis=1)
        neg_scores = jnp.sum(ue * ne, axis=1)
        mf_loss = jnp.mean(jax.nn.softplus(neg_scores - pos_scores))

        u0 = params["user_embedding"][users]
        p0 = params["item_embedding"][pos]
        n0 = params["item_embedding"][neg]
        reg = 0.5 * (
            jnp.sum(u0.astype(jnp.float32) ** 2)
            + jnp.sum(p0.astype(jnp.float32) ** 2)
            + jnp.sum(n0.astype(jnp.float32) ** 2)
        ) / users.shape[0]
        loss = mf_loss + l2_decay * reg
        return loss, {"mf_loss": mf_loss, "reg_loss": reg}


def init_params(
    key: jax.Array,
    cfg: ModelConfig,
    n_users: int,
    n_items: int,
    pretrained: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Params:
    """N(0, init_std) init (`LightGCN.py:171`: stddev 0.01; PyTorch uses 0.1 at
    `model.py:112-113`) or pretrained tables (the `--pretrain` path,
    `model.py:115-118`, e.g. ProNE embeddings)."""
    dtype = jnp.dtype(cfg.param_dtype)
    params: Params = {}
    if pretrained is not None:
        params["user_embedding"] = jnp.asarray(pretrained[0], dtype=dtype)
        params["item_embedding"] = jnp.asarray(pretrained[1], dtype=dtype)
    else:
        ku, ki = jax.random.split(key)
        params["user_embedding"] = (
            jax.random.normal(ku, (n_users, cfg.embed_dim), dtype) * cfg.init_std
        )
        params["item_embedding"] = (
            jax.random.normal(ki, (n_items, cfg.embed_dim), dtype) * cfg.init_std
        )
    if cfg.arch in ("ngcf", "gcn", "gcmc"):
        kw = jax.random.split(jax.random.fold_in(key, 7), (cfg.n_layers, 3))
        d = cfg.embed_dim
        for k in range(cfg.n_layers):
            for j, name in enumerate(("gc", "bi", "mlp")):
                kwj, kbj = jax.random.split(kw[k, j])
                params[f"w_{name}_{k}"] = (
                    jax.random.normal(kwj, (d, d), dtype) * cfg.init_std
                )
                # TF initializes biases with the SAME N(0, 0.01) initializer
                # (`LightGCN.py:168,186-196`), not zeros
                params[f"b_{name}_{k}"] = (
                    jax.random.normal(kbj, (d,), dtype) * cfg.init_std
                )
    return params
