"""Weighted multi-factor score fusion (`recommend_combination.py:442-507`).

Combined score = sum_f w_f * score_f over the score-form strategies; selection is
plain top-k, or relevance-conditioned DPP when 'div' is among the factors (with the
fused score as the relevance signal and the 'div' weight steering the
diversity/relevance trade-off).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

import jax

from serendipity_tpu.rec.dpp import dpp_rerank
from serendipity_tpu.rec.strategies import topk_from_scores
from serendipity_tpu.utils.aot import aot_call


@jax.jit
def _scale(mat, w):
    return mat * w


@jax.jit
def _axpy(acc, mat, w):
    """acc + w * mat as one jit (eager adds cost a relay round-trip per
    primitive).  Fusion accumulates PAIRWISE so at most two [U, C] factor
    matrices are alive at once — an all-at-once sum would pin every factor's
    650 MB matrix in HBM simultaneously at ML-25M scale."""
    return acc + mat * w


def fuse_scores(
    scores: Dict[str, np.ndarray],
    factor_names: Sequence[str],
    weights: Sequence[float],
) -> np.ndarray:
    """Weighted sum over the non-div factors (`recommend_combination.py:457-461`;
    'div' contributes no score matrix, `recommend_combination.py:504-505`)."""
    total = None
    for name, w in zip(factor_names, weights):
        if name == "div":
            continue
        s = scores[name] * np.float32(w)
        total = s if total is None else total + s
    if total is None:
        raise ValueError("fusion needs at least one score-form factor")
    return total


def recommend_fused_dev(
    candidates: np.ndarray,
    scorer,                              # StrategyScorer (device-resident path)
    factor_names: Sequence[str],
    weights: Sequence[float],
    emb_item: np.ndarray,
    k: int = 20,
    rel_factor: float = 1.0,
    mesh=None,
    cand_dev=None,
    seed: int = 0,
    alpha: float = 1.0,
) -> Tuple[str, np.ndarray]:
    """`recommend_fused` with the weighted sum accumulated ON DEVICE from
    `scorer.score_dev` matrices (round 5): no [U, C] score matrix ever reaches
    the host — plain fusions select top-k on device, and the
    relevance-conditioned DPP consumes the fused matrix straight from HBM."""
    import jax.numpy as jnp


    name = "_".join(f"{w}{n}" for n, w in zip(factor_names, weights))
    fused = None
    for n, w in zip(factor_names, weights):
        if n == "div":
            continue
        s_n = scorer.score_dev(n, seed=seed, alpha=alpha)
        if fused is None:
            fused = aot_call(_scale, (s_n, jnp.float32(w)))
        else:
            fused = aot_call(_axpy, (fused, s_n, jnp.float32(w)))
    if fused is None:
        raise ValueError("fusion needs at least one score-form factor")
    if "div" in factor_names:
        div_weight = float(weights[list(factor_names).index("div")])
        rec = dpp_rerank(
            candidates, emb_item, k, rel_scores=fused, div_weight=div_weight,
            rel_factor=rel_factor, mesh=mesh, cand_dev=cand_dev,
        )
    else:
        rec = scorer.topk_ids(fused, k)
    return name, rec


def recommend_fused(
    candidates: np.ndarray,
    scores: Dict[str, np.ndarray],
    factor_names: Sequence[str],
    weights: Sequence[float],
    emb_item: np.ndarray,
    k: int = 20,
    rel_factor: float = 1.0,
    mesh=None,
    cand_dev=None,
) -> Tuple[str, np.ndarray]:
    """Returns (combo_name, rec matrix [U, k]).

    combo_name mirrors the reference file-tag scheme
    `"{w}{name}_..."` (`recommend_combination.py:449-450`).
    """
    name = "_".join(f"{w}{n}" for n, w in zip(factor_names, weights))
    fused = fuse_scores(scores, factor_names, weights)
    if "div" in factor_names:
        div_weight = float(weights[list(factor_names).index("div")])
        rec = dpp_rerank(
            candidates, emb_item, k, rel_scores=fused, div_weight=div_weight,
            rel_factor=rel_factor, mesh=mesh, cand_dev=cand_dev,
        )
    else:
        rec = topk_from_scores(fused, candidates, k)
    return name, rec
