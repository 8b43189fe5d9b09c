"""End-to-end training runner: dataset -> trained embeddings + result record.

Covers the role of the reference trainer mains (`lightGCN/.../code/main.py`,
`LightGCN-tf/LightGCN.py:431-731`): train with periodic eval + early stopping, keep
the best params, export `emb_user.npy` / `emb_item.npy`, and append a result line in
the spirit of `output/<ds>/LightGCN.result` (`LightGCN.py:723-731`).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from typing import Dict, Optional, Tuple

import numpy as np

from serendipity_tpu.config import ExperimentConfig
from serendipity_tpu.data.datasets import Interactions, load_adjacency_list, load_serendipity_csv
from serendipity_tpu.models.lightgcn import EmbeddingModel
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.evaluator import Evaluator


def load_dataset(cfg: ExperimentConfig) -> Interactions:
    path = cfg.data.path
    # prefer the serendipity CSV schema when present: it carries strictly more
    # information than the adjacency lists (ratings, timestamps, serLabels —
    # needed for HR_ser/NDCG_ser and the quality/novelty factors)
    if os.path.exists(os.path.join(path, "rating_train.csv")):
        return load_serendipity_csv(path)
    if os.path.exists(os.path.join(path, "train.txt")):
        return load_adjacency_list(path)
    return load_serendipity_csv(path)


def build_model(cfg: ExperimentConfig, n_users: int, n_items: int) -> EmbeddingModel:
    import jax.numpy as jnp

    return EmbeddingModel(
        arch=cfg.model.arch,
        n_users=n_users,
        n_items=n_items,
        embed_dim=cfg.model.embed_dim,
        n_layers=cfg.model.n_layers,
        edge_dropout=cfg.model.edge_dropout,
        mess_dropout=cfg.model.mess_dropout,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
    )


def _build_sharded(cfg, inter, pretrained):
    """Multi-chip construction (the `mesh.data_axis`/`mesh.model_axis` CLI path):
    dst-sharded propagation + row-sharded tables + sharded evaluation."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from serendipity_tpu.parallel.evaluator import ShardedEvaluator
    from serendipity_tpu.parallel.mesh import make_mesh
    from serendipity_tpu.parallel.sharded import (
        _round_up, build_sharded_device_data, table_shardings,
    )

    mesh = make_mesh(n_data=cfg.mesh.data_axis, n_model=cfg.mesh.model_axis)
    n_data = mesh.shape["data"]
    if cfg.train.batch_size % n_data:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, batch_size=_round_up(cfg.train.batch_size, n_data)
            ),
        )
    data, model, up, ip = build_sharded_device_data(cfg, inter, mesh)
    trainer = BPRTrainer(
        cfg, model, data,
        batch_sharding=NamedSharding(mesh, P("data")),
        param_shardings=table_shardings(mesh),
    )
    evaluator = ShardedEvaluator(
        model, data, inter, cfg.eval, mesh=mesh, n_items_padded=ip
    )
    if pretrained is not None:
        pu, pi = np.asarray(pretrained[0]), np.asarray(pretrained[1])
        pretrained = (
            np.pad(pu, ((0, up - pu.shape[0]), (0, 0))),
            np.pad(pi, ((0, ip - pi.shape[0]), (0, 0))),
        )
    ev_factory = lambda uids: ShardedEvaluator(  # noqa: E731
        model, data, inter, cfg.eval, mesh=mesh, n_items_padded=ip,
        user_subset=uids,
    )
    return cfg, data, model, trainer, evaluator, pretrained, ev_factory


def run_training(
    cfg: ExperimentConfig,
    inter: Optional[Interactions] = None,
    pretrained: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    log_fn=print,
) -> Dict:
    from serendipity_tpu.utils.logging import MetricsLogger

    if inter is None:
        inter = load_dataset(cfg)
    use_mesh = cfg.mesh.model_axis > 1 or cfg.mesh.data_axis > 1
    ev_factory = None
    if use_mesh:
        cfg, data, model, trainer, evaluator, pretrained, ev_factory = (
            _build_sharded(cfg, inter, pretrained)
        )
    else:
        data = build_device_data(inter, adj_type=cfg.model.adj_type, spmm_mode=cfg.model.spmm, compute_dtype=cfg.model.compute_dtype, sampler=cfg.train.sampler)
        model = build_model(cfg, inter.n_users, inter.n_items)
        trainer = BPRTrainer(cfg, model, data)
        evaluator = Evaluator(model, data, inter, cfg.eval)
    state = trainer.init_state(pretrained=pretrained)

    out_dir = os.path.join(cfg.out_dir, cfg.data.name)
    mlog = MetricsLogger(out_dir, echo=False, tensorboard=cfg.tensorboard)
    mlog.log("config", **{k: str(v) for k, v in asdict(cfg).items()})

    def log_both(msg: str) -> None:
        log_fn(msg)
        mlog.log("train", msg=msg)

    ckpt_dir = os.path.join(out_dir, "ckpt") if cfg.train.checkpoint else None
    if cfg.train.resume:
        from serendipity_tpu.train.checkpoint import restore_checkpoint

        resume_dir = ckpt_dir or os.path.join(out_dir, "ckpt")
        try:
            state = restore_checkpoint(resume_dir, state)
            log_both(f"resumed from {resume_dir} at epoch {state.epoch}")
        except FileNotFoundError:
            log_both(f"no checkpoint under {resume_dir}; training from scratch")

    t0 = time.perf_counter()
    state = trainer.fit(
        state, evaluator, log_fn=log_both,
        metrics_fn=lambda rec: mlog.log("epoch", **rec),
        checkpoint_dir=ckpt_dir,
    )
    train_time = time.perf_counter() - t0

    final = evaluator.evaluate(state.params)
    if cfg.eval.auc:
        final["auc"] = evaluator.evaluate_auc(state.params)
    if cfg.eval.report:
        from serendipity_tpu.train.evaluator import sparsity_report

        for sstate, m in sparsity_report(
            model, data, inter, cfg.eval, state.params,
            evaluator_factory=ev_factory,
        ):
            log_fn(sstate)
            log_fn("  " + "  ".join(f"{k}={v:.5f}" for k, v in m.items()))
    emb_user, emb_item = trainer.export_embeddings(state)
    # mesh path trains padded tables; the export contract is the real catalog
    emb_user, emb_item = emb_user[: inter.n_users], emb_item[: inter.n_items]

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "emb_user.npy"), emb_user)
    np.save(os.path.join(out_dir, "emb_item.npy"), emb_item)
    record = {
        "dataset": cfg.data.name,
        "arch": cfg.model.arch,
        "embed_dim": cfg.model.embed_dim,
        "n_layers": cfg.model.n_layers,
        "lr": cfg.train.lr,
        "l2_decay": cfg.train.l2_decay,
        "epochs_run": state.epoch,
        "best_epoch": state.best_epoch,
        "train_time_s": round(train_time, 2),
        **{k: round(v, 5) for k, v in final.items()},
    }
    with open(os.path.join(out_dir, "result.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    log_fn(f"result: {json.dumps(record)}")
    mlog.close()
    return {
        "record": record,
        "state": state,
        "emb_user": emb_user,
        "emb_item": emb_item,
        "interactions": inter,
        "history": state.history,
    }
