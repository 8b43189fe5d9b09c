"""Single dataclass-based configuration system.

The reference scatters configuration over three argparse parsers and hand-edited module
globals (`code/parse.py:8-46`, `LightGCN-tf/utility/parser.py:10-71`, `proNE.py:123-139`,
`main.py:25-85`).  Here one typed tree of dataclasses covers every stage; CLI overrides
are applied with dotted `key=value` pairs (see `serendipity_tpu.cli`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple


@dataclass
class DataConfig:
    """Dataset location and preprocessing knobs.

    Mirrors the contract of the reference loaders: the `train.txt`/`test.txt`
    adjacency-list format (`LightGCN-tf/utility/load_data.py:30-85`) and the CSV schema
    written by `rating_data_process.generateSerData` (`rating_data_process.py:293-389`).
    """

    path: str = ""                      # directory holding train.txt/test.txt or CSVs
    name: str = "mlls"
    k_core: int = 10                    # reference K_CORE (`rating_data_process.py:439`)
    train_ratio: float = 0.8            # per-user temporal split (`rating_data_process.py:438`)
    min_test_items: int = 1


@dataclass
class ModelConfig:
    """Embedding-model hyperparameters.

    Defaults follow the TF reference config that produced the bundled mlls baseline
    (`LightGCN-tf/output/mlls/LightGCN.result:1`): embed 64, 4 propagation layers,
    lr 0.01, reg 1e-5.
    """

    arch: str = "lightgcn"              # lightgcn | mf | ngcf | gcn | gcmc
    embed_dim: int = 64
    n_layers: int = 4
    init_std: float = 0.01              # TF init N(0, 0.01) (`LightGCN.py:171`)
    # edge ("node") dropout on the sparse adjacency (`LightGCN.py:364-374`);
    # 0.0 disables (the bundled result used node_dropout_flag with 0.1).
    edge_dropout: float = 0.0
    # per-layer message dropout for ngcf/gcn/gcmc (`--mess_dropout`; present but
    # commented out in the reference layer code, so the parity default is 0)
    mess_dropout: float = 0.0
    # adjacency operator: pre | plain | norm | gcmc (`--adj_type`,
    # `LightGCN.py:444-456`; `pre` = D^-1/2 A D^-1/2 produced every baseline)
    adj_type: str = "pre"
    # propagation kernel family: auto | hybrid | ell | joint | edges
    # (see `train/device.build_device_data`; auto = cost-model choice between the
    # hybrid dense-head/ELL-tail layout and pure segmented ELL)
    spmm: str = "auto"
    param_dtype: str = "float32"
    # propagation/matmul dtype.  bf16 is the TPU-native default: measured BETTER
    # mlls quality than f32 (recall@20 0.16391 vs 0.16248, within run variance of
    # the reference's 0.16601 best) at ~2x the epoch speed.  Params/Adam stay f32.
    compute_dtype: str = "bfloat16"


@dataclass
class TrainConfig:
    """BPR training loop (semantics of `code/Procedure.py:26-57` + `LightGCN.py:574-698`)."""

    lr: float = 0.01
    l2_decay: float = 1e-5              # reg on ego embeddings (`LightGCN.py:346-357`)
    batch_size: int = 1024
    epochs: int = 400
    eval_every: int = 20                # TF tests every 20 epochs (`LightGCN.py:600-620`)
    patience: int = 5                   # early stopping steps (`utility/helper.py:38-53`)
    seed: int = 2020
    neg_resample_rounds: int = 16       # fixed-round device rejection sampling
    # rejection-membership test: "bitmap" = one byte gather per draw into the
    # plane-packed train bitmap (shared with the fused evaluator; bit-identical
    # decisions to bisection for the same PRNG draws); "bisect" = per-draw
    # binary search of the user's sorted row (no bitmap memory)
    sampler: str = "bitmap"
    steps_per_epoch: int = 0            # 0 = ceil(n_train / batch_size)
    # steps per compiled scan: one epoch = several chunk calls.  Bounded because
    # compile time grows with scan length on remote-compile TPU toolchains; the
    # ~0.1 s dispatch per chunk is noise next to epoch compute.
    scan_chunk: int = 32
    # Orbax-checkpoint the full train state (params, Adam moments, PRNG key,
    # progress counters) under <out_dir>/<dataset>/ckpt on every improving eval —
    # the reference's best-snapshot scheme (`lightGCN/.../main.py:93`,
    # `LightGCN.py:471-478`)
    checkpoint: bool = False
    # restore the latest checkpoint before training (reference `--load 1` /
    # pretrain restore, `code/main.py:25-42`, `LightGCN.py:488-517`)
    resume: bool = False


@dataclass
class EvalConfig:
    """Full-catalog ranking evaluation (contract of `evaluate_foldout.h:16-112`)."""

    topks: Tuple[int, ...] = (20,)
    user_batch: int = 1024
    metrics: Tuple[str, ...] = ("precision", "recall", "ap", "ndcg", "mrr")
    # ranking protocol: "foldout" (cumulative metrics over the user's whole test
    # set, `evaluate_foldout.h:16-112`) or "loo" (HR/NDCG/MRR for a single
    # held-out item, `evaluator/python/evaluate_loo.py:13-64`)
    protocol: str = "foldout"
    # per-user ROC AUC over non-train items (`code/utils.py:265-274`)
    auc: bool = False
    # fused masked-retrieval ranking eval: scoring + train-item masking + exact
    # top-k in one Pallas kernel (ops/pallas_score.fused_score_topk_masked) —
    # the [B, N] score matrix never reaches HBM.  Needs user_batch % 128 == 0
    # and max topk <= 64; silently keeps the XLA path otherwise.
    fused: bool = False
    # sparsity-level performance report (`LightGCN-tf/LightGCN.py:526-560`, --report)
    report: bool = False

    def __post_init__(self):
        # a typo ("LOO", "leave-one-out") must not silently run foldout
        if self.protocol not in ("foldout", "loo"):
            raise ValueError(
                f"eval.protocol must be 'foldout' or 'loo', got {self.protocol!r}"
            )


@dataclass
class MeshConfig:
    """Device mesh layout: `data` × `model` axes.

    The reference is single-device; this subsystem is green-field (SURVEY.md §2).
    Embedding tables shard rows over `model`; batches shard over `data`.
    """

    data_axis: int = 0                  # 0 = use all devices on the data axis
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


@dataclass
class ProNEConfig:
    """ProNE spectral init (defaults of `proNE.py:123-139`)."""

    dim: int = 64
    order: int = 10                     # Chebyshev terms ("step")
    mu: float = 0.2
    theta: float = 0.5                  # Bessel argument ("s")
    svd_iters: int = 7                  # subspace iterations for randomized SVD
    svd_oversample: int = 16


@dataclass
class RecConfig:
    """Candidate generation + strategy/fusion stage (`recommend.py`, `recommend_combination.py`)."""

    n_candidates: int = 1000            # K_c (`recommend.py:359`)
    n_score_bins: int = 10              # stratification folds (`recommend.py:359`)
    bin_epsilon: float = 0.1            # max_dis + eps (`recommend.py:377`)
    top_k: int = 20
    pm_k: int = 200                     # pseudo-baseline size (`utils.py:70`)
    dpp_epsilon: float = 1e-10
    elasticity_alpha: float = 1.0
    # relevance divisor in the div-fusion DPP kernel.  1.0 = intended semantics;
    # the reference's factor=1e6 (`recommend_combination.py:265`) flattens the
    # relevance term to a no-op (documented deviation)
    dpp_rel_factor: float = 1.0
    seeds: Tuple[int, ...] = (777, 7777, 77777, 73, 79)   # `main.py:80`
    strategies: Tuple[str, ...] = (
        "rand", "nov", "pop", "qua", "ela", "acc", "div", "dif",
    )


@dataclass
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    prone: ProNEConfig = field(default_factory=ProNEConfig)
    rec: RecConfig = field(default_factory=RecConfig)
    out_dir: str = "runs"
    # mirror scalar metrics to TensorBoard under <out_dir>/<dataset>/tb (the
    # reference's tensorboardX writers, `lightGCN/.../main.py:47-54`)
    tensorboard: bool = False


def apply_overrides(cfg: Any, overrides: Sequence[str]) -> Any:
    """Apply dotted `a.b.c=value` overrides to a dataclass tree, returning a new tree."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if not _:
            raise ValueError(f"override {ov!r} is not of the form key=value")
        parts = key.strip().split(".")
        cfg = _set_path(cfg, parts, raw.strip())
    return cfg


def _parse_value(raw: str, current: Any) -> Any:
    import ast

    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(current, str):
        return raw
    try:
        val = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw
    if isinstance(current, tuple) and not isinstance(val, tuple):
        return (val,)
    return val


def _set_path(node: Any, parts: Sequence[str], raw: str) -> Any:
    name = parts[0]
    if not dataclasses.is_dataclass(node) or not hasattr(node, name):
        raise AttributeError(f"no config field {name!r} on {type(node).__name__}")
    current = getattr(node, name)
    if len(parts) == 1:
        return dataclasses.replace(node, **{name: _parse_value(raw, current)})
    return dataclasses.replace(node, **{name: _set_path(current, parts[1:], raw)})
