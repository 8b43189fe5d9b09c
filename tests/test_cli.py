"""CLI end-to-end: raw CSV -> preprocess -> train -> eval -> pipeline, all through
the command-line entry points on a tiny synthetic dataset."""

import json
import os

import numpy as np
import pytest

from serendipity_tpu import cli


@pytest.fixture(scope="module")
def raw_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("raw") / "ratings.csv"
    rng = np.random.default_rng(0)
    n = 4000
    users = rng.integers(0, 60, n)
    items = rng.integers(0, 90, n)
    with open(p, "w") as f:
        f.write("userInd,itemInd,rating,timestamp\n")
        for u, i in zip(users, items):
            f.write(f"{u},{i},{rng.uniform(1, 5):.2f},{rng.uniform(0, 1e6):.0f}\n")
    return str(p)


def test_cli_preprocess_train_pipeline(raw_csv, tmp_path, monkeypatch):
    out_ds = str(tmp_path / "ds")
    cli.main([
        "preprocess", "--input", raw_csv, "--output", out_ds,
        "data.k_core=3",
    ])
    assert os.path.exists(os.path.join(out_ds, "train.txt"))
    assert os.path.exists(os.path.join(out_ds, "rating_train.csv"))
    assert os.path.exists(os.path.join(out_ds, "item.csv"))
    assert os.path.exists(os.path.join(out_ds, "proNE_ui_graph.txt"))

    monkeypatch.chdir(tmp_path)
    cli.main([
        "train", f"data.path={out_ds}", "data.name=tiny",
        "model.embed_dim=8", "model.n_layers=1",
        "train.epochs=2", "train.eval_every=1", "train.batch_size=64",
        "eval.user_batch=32",
    ])
    emb_dir = tmp_path / "runs" / "tiny"
    assert (emb_dir / "emb_user.npy").exists()
    rec = json.loads((emb_dir / "result.jsonl").read_text().splitlines()[-1])
    assert "recall@20" in rec

    cli.main([
        "eval", "--embeddings", str(emb_dir),
        f"data.path={out_ds}", "eval.user_batch=32",
    ])

    cli.main([
        "prone", f"data.path={out_ds}", "data.name=tiny", "prone.dim=8",
    ])
    assert (emb_dir / "emb_user_proNE.npy").exists()

    # ProNE -> LightGCN fine-tune interop: a directory holding only the
    # reference-named emb_*_proNE.npy files is a valid --pretrained init
    # (the reference's --pretrain path, `LightGCN.py:168-180`)
    cli.main([
        "prone", f"data.path={out_ds}", "data.name=tiny_prone", "prone.dim=8",
    ])
    prone_dir = tmp_path / "runs" / "tiny_prone"
    assert not (prone_dir / "emb_user.npy").exists()
    cli.main([
        "train", "--pretrained", str(prone_dir),
        f"data.path={out_ds}", "data.name=tiny_ft",
        "model.embed_dim=8", "model.n_layers=1",
        "train.epochs=1", "train.eval_every=1", "train.batch_size=64",
        "eval.user_batch=32",
    ])
    assert (tmp_path / "runs" / "tiny_ft" / "emb_user.npy").exists()
    cli.main([
        "eval", "--embeddings", str(prone_dir),
        f"data.path={out_ds}", "eval.user_batch=32",
    ])

    cli.main([
        "pipeline", f"data.path={out_ds}", "data.name=tiny",
        "--embeddings", str(emb_dir),
        "--fuse", "acc:0.5,nov:0.5",
        "rec.n_candidates=20", "rec.top_k=5", "rec.seeds=(1,)",
    ])
    assert (emb_dir / "res" / "summary.json").exists()
    summary = json.loads((emb_dir / "res" / "summary.json").read_text())
    assert "0.5acc_0.5nov" in summary["methods"]


def test_cli_seren_smoke(raw_csv, tmp_path, monkeypatch):
    """`cli seren` end to end on the tiny fixture: assemble -> (unexpectedness
    pairs) -> train a few steps -> HR/NDCG report + saved artifacts (the
    reference's documented two-step run, SerenEnhance/README.md)."""
    out_ds = str(tmp_path / "ds")
    cli.main([
        "preprocess", "--input", raw_csv, "--output", out_ds, "data.k_core=3",
    ])
    monkeypatch.chdir(tmp_path)
    cli.main([
        "seren", f"data.path={out_ds}", "data.name=tiny",
        "--unexpectedness", "--steps", "3", "--batch-size", "32",
        "--n-reviews", "5", "--n-pos", "4", "--n-cand", "20",
        "prone.dim=8", "rec.n_candidates=20", "rec.top_k=5",
    ])
    out = tmp_path / "runs" / "tiny"
    assert (out / "seren_params.msgpack").exists()
    m = json.loads((out / "seren_metrics.json").read_text())
    assert m["unexpectedness"] is True and m["steps"] == 3
    assert 0.0 <= m["metrics"]["hr@10"] <= 1.0


def test_fuse_sweep_parsing():
    """--fuse / --fuse-sweep expansion (the reference 9-point weight grid)."""
    from serendipity_tpu.cli import expand_fusion_specs

    specs = expand_fusion_specs(["acc:0.5,nov:0.5"], ["acc,div"])
    assert specs[0] == (["acc", "nov"], [0.5, 0.5])
    assert len(specs) == 10
    assert specs[1] == (["acc", "div"], [0.1, 0.9])
    assert specs[-1] == (["acc", "div"], [0.9, 0.1])
    assert expand_fusion_specs(None, None) is None
