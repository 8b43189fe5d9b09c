"""Serendipity-enhanced transformer re-ranker (capability of P14, SerenEnhance —
the SIGIR'23 "Serendipity-enhance" baseline bundled with the reference at
`SerenEnhance/code/SerenEnhance.py`).

Architecture (`SerenEnhance.py:160-284`): a user's last 20 item embeddings
[20, 128] get sinusoidal positional encodings, then THREE towers (serendipity /
relevance / unexpectedness), each a stack of 3 transformer blocks (MHA 2 heads with
per-head dim 128, FFN 32, post-LN residuals, dropout 0.1) -> mean-pool -> Dense(relu,
L2 1e-3) -> dropout 0.2.  Each tower's user vector scores its own 50 pos + 50 neg
candidate embeddings by dot product; training minimizes the summed pairwise BCE
softplus(-(pos - neg)) of the three towers (`SerenEnhance.py:338-352`: BCE
from_logits on sigmoid-score differences against all-one labels).  Inference ranks
candidates by the merged user vector x_seren + a * x_rel + (1-a) * x_unp, a = 0.6.

TPU-native: flax + optax, bf16-friendly, one jitted train step; HR@k / NDCG@k
computed on device from the merged scores.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_positions(n: int, d: int) -> np.ndarray:
    """Fixed sin/cos table (`SerenEnhance.py:188-202`)."""
    pos = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(np.log(10000.0) / d))
    pe = np.zeros((n, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class TransformerBlock(nn.Module):
    embed_dim: int = 128
    n_heads: int = 2
    ff_dim: int = 32
    rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.n_heads * self.embed_dim,  # keras key_dim = per-head
            out_features=self.embed_dim,
        )(x, x)
        attn = nn.Dropout(self.rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-6)(x + attn)
        h = nn.Dense(self.ff_dim)(x)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim)(h)
        h = nn.Dropout(self.rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-6)(x + h)


class Tower(nn.Module):
    embed_dim: int = 128
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool):
        for _ in range(self.n_blocks):
            x = TransformerBlock(embed_dim=self.embed_dim)(x, deterministic)
        x = jnp.mean(x, axis=1)                        # GlobalAveragePooling1D
        x = nn.Dense(self.embed_dim)(x)
        x = nn.relu(x)
        return nn.Dropout(0.2)(x, deterministic=deterministic)


class SerenTransformer(nn.Module):
    embed_dim: int = 128
    n_reviews: int = 20
    merge_a: float = 0.6

    @nn.compact
    def __call__(
        self,
        history: jnp.ndarray,      # [B, n_reviews, D]
        y_seren: jnp.ndarray,      # [B, C, D] candidates per tower
        y_rel: jnp.ndarray,
        y_unp: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        pe = jnp.asarray(sinusoidal_positions(self.n_reviews, self.embed_dim))
        x = history + pe[None]
        u_seren = Tower(self.embed_dim, name="tower_seren")(x, deterministic)
        u_rel = Tower(self.embed_dim, name="tower_rel")(x, deterministic)
        u_unp = Tower(self.embed_dim, name="tower_unp")(x, deterministic)

        def score(u, y):
            return jnp.einsum("bd,bcd->bc", u, y, preferred_element_type=jnp.float32)

        r_seren = score(u_seren, y_seren)
        r_rel = score(u_rel, y_rel)
        r_unp = score(u_unp, y_unp)
        u_merged = u_seren + self.merge_a * u_rel + (1.0 - self.merge_a) * u_unp
        r_merged = score(u_merged, y_seren)
        return {
            "seren": r_seren, "rel": r_rel, "unp": r_unp, "merged": r_merged,
        }


@dataclass
class SerenTrainer:
    """Pairwise training + ranking eval (`SerenEnhance.py:290-407`)."""

    model: SerenTransformer
    lr: float = 1e-4
    l2: float = 1e-3
    n_pos: int = 50

    def init(self, key, n_reviews=20, n_cand=100, dim=128):
        import optax

        h = jnp.zeros((1, n_reviews, dim))
        y = jnp.zeros((1, n_cand, dim))
        params = self.model.init(
            {"params": key, "dropout": key}, h, y, y, y, deterministic=True
        )["params"]
        self.optimizer = optax.adam(self.lr)
        return params, self.optimizer.init(params)

    def loss_fn(self, params, batch, rng):
        out = self.model.apply(
            {"params": params},
            batch["history"], batch["y_seren"], batch["y_rel"], batch["y_unp"],
            deterministic=False,
            rngs={"dropout": rng},
        )

        def pairwise_bce(scores):
            # sigmoid scores, pos-neg pairs, BCE(from_logits) vs label 1
            p = jax.nn.sigmoid(scores)
            diff = p[:, : self.n_pos] - p[:, self.n_pos:]
            return jnp.mean(jax.nn.softplus(-diff))

        loss = (
            pairwise_bce(out["seren"])
            + pairwise_bce(out["rel"])
            + pairwise_bce(out["unp"])
        )
        l2 = sum(
            jnp.sum(w ** 2)
            for path, w in jax.tree.leaves_with_path(params)
            if path[-1].key == "kernel"
        )
        return loss + self.l2 * l2

    def make_train_step(self):
        import optax

        optimizer = self.optimizer

        @jax.jit
        def step(params, opt_state, batch, rng):
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(self.loss_fn)(params, batch, sub)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss

        return step

    def make_eval_step(self):
        model = self.model

        @jax.jit
        def step(params, history, y_cand):
            out = model.apply(
                {"params": params}, history, y_cand, y_cand, y_cand,
                deterministic=True,
            )
            return out["merged"]                      # [B, C]; truth at index 0

        return step

    @staticmethod
    def ranking_metrics(scores: np.ndarray, ks=(1, 5, 10)) -> Dict[str, float]:
        """HR@k (truth = candidate 0) + NDCG@k with a single positive."""
        rank_of_true = (scores > scores[:, :1]).sum(axis=1)   # 0-based rank
        out = {}
        for k in ks:
            out[f"hr@{k}"] = float((rank_of_true < k).mean())
        for k in (5, 10):
            gains = np.where(rank_of_true < k, 1.0 / np.log2(rank_of_true + 2.0), 0.0)
            out[f"ndcg@{k}"] = float(gains.mean())
        return out
