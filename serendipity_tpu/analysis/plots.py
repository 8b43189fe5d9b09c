"""Figure generation (plot half of `exp_analysis.py`, P13).

Heatmaps of the normalized result matrix (`plot_res_mat`, `exp_analysis.py:112-157`),
disentanglement heatmaps (`plot_disent_mat`, `:46-95`), top-k sensitivity line plots
(`topk_single_factor`, `:625-691`), and the long-tail frequency plot
(`interactions_num_freq`, `:564-576`).  matplotlib is imported lazily; every function
degrades to a no-op (returning None) when it is unavailable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def plot_res_mat(
    mean: np.ndarray,
    methods: Sequence[str],
    columns: Sequence[str],
    out_path: Optional[str] = None,
    normalize: bool = True,
):
    """Column-normalized metric heatmap (`plot_res_mat` semantics: each metric
    column scaled to [0, 1] before drawing)."""
    plt = _plt()
    if plt is None:
        return None
    mat = mean.astype(float).copy()
    if normalize:
        mn = mat.min(axis=0, keepdims=True)
        mx = mat.max(axis=0, keepdims=True)
        mat = (mat - mn) / np.maximum(mx - mn, 1e-12)
    fig, ax = plt.subplots(figsize=(1.2 * len(columns) + 2, 0.5 * len(methods) + 2))
    im = ax.imshow(mat, cmap="viridis", aspect="auto", vmin=0, vmax=1)
    ax.set_xticks(range(len(columns)), columns, rotation=45, ha="right")
    ax.set_yticks(range(len(methods)), methods)
    for i in range(len(methods)):
        for j in range(len(columns)):
            ax.text(j, i, f"{mean[i, j]:.3f}", ha="center", va="center",
                    color="white" if mat[i, j] < 0.6 else "black", fontsize=7)
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return fig


def plot_disent_mat(
    disent: np.ndarray,
    methods: Sequence[str],
    out_path: Optional[str] = None,
):
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(0.7 * len(methods) + 2, 0.6 * len(methods) + 2))
    im = ax.imshow(disent, cmap="magma", aspect="auto")
    ax.set_xticks(range(len(methods)), methods, rotation=45, ha="right")
    ax.set_yticks(range(len(methods)), methods)
    for i in range(len(methods)):
        for j in range(len(methods)):
            ax.text(j, i, f"{disent[i, j]:.2f}", ha="center", va="center",
                    color="white", fontsize=7)
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return fig


def plot_topk_sensitivity(
    curves: Dict[str, np.ndarray],
    ks: Sequence[int],
    metric_name: str = "ser1",
    out_path: Optional[str] = None,
):
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    for m, vals in curves.items():
        ax.plot(ks, vals, marker="o", label=m)
    ax.set_xlabel("K")
    ax.set_ylabel(metric_name)
    ax.legend(fontsize=7, ncol=2)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return fig


def plot_interaction_frequency(
    stats: Dict[str, np.ndarray],
    out_path: Optional[str] = None,
):
    plt = _plt()
    if plt is None:
        return None
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    edges = stats["item_degree_edges"]
    axes[0].bar(edges[:-1], stats["item_degree_hist"],
                width=np.diff(edges), align="edge")
    axes[0].set_xlabel("item interaction count")
    axes[0].set_ylabel("#items")
    axes[0].set_yscale("log")
    axes[1].plot(stats["top_fraction"] * 100, stats["coverage"] * 100, marker="o")
    axes[1].set_xlabel("top % most popular items")
    axes[1].set_ylabel("% of interactions covered")
    axes[1].grid(alpha=0.3)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return fig
