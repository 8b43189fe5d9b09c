"""Multi-process `jax.distributed` validation (SURVEY.md §4: "multi-host tests via
jax.distributed with CPU-backend multi-process simulation").

Spawns 2 OS processes, each `jax.distributed.initialize`d on the CPU backend with
2 local devices (gloo collectives), builds the global 2x2 data x model mesh, and
runs the REAL sharded train step (`parallel/sharded.build_sharded_train_setup`) —
row-sharded tables, dst-sharded ELL propagation, cross-process all-gathers/psums.
The loss trajectory must be identical across the two processes AND identical to a
single-process run on a same-shape 4-device mesh: the multi-host story is the same
SPMD program, only the controller count changes.

The worker half of this file doubles as the runnable script
(`python tests/test_distributed.py <pid> <nproc> <port>`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

STEPS = 6


def _worker(pid: int, nproc: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    losses, cand_sum = _run_steps(expected_devices=4)
    print("RESULT " + json.dumps(
        {"pid": pid, "losses": losses, "cand_sum": cand_sum}), flush=True)


def _run_steps(expected_devices: int):
    """Build the sharded setup on a 2x2 mesh over all (global) devices and run
    STEPS train steps; returns the loss list.  Identical code for the
    single-controller reference and each distributed worker."""
    import jax

    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.parallel.mesh import make_mesh
    from serendipity_tpu.parallel.sharded import build_sharded_train_setup

    assert jax.device_count() == expected_devices
    inter = synthetic_interactions(60, 90, avg_degree=8, seed=5)
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.embed_dim=16", "model.n_layers=2", "model.compute_dtype=float32",
         "train.batch_size=32", "train.seed=11"],
    )
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    setup = build_sharded_train_setup(cfg, inter, mesh)
    params, opt_state = setup.params, setup.opt_state
    # numpy (uncommitted -> replicated) so the first jit call is valid in
    # multi-controller runs; subsequent keys are global step_fn outputs
    key = np.asarray(jax.random.PRNGKey(7))
    losses = []
    for _ in range(STEPS):
        params, opt_state, key, loss = setup.step_fn(params, opt_state, key)
        losses.append(float(jax.device_get(loss)))

    # sharded STUDY stage across the same mesh: candidate generation with the
    # cross-process pmin/pmax + per-user-keyed draws.  The full matrix is not
    # addressable from one controller, so parity pins a replicated checksum
    # (values < 2^24, so the f32 sum is exact).
    import jax.numpy as jnp

    from serendipity_tpu.parallel.study import candidates_sharded

    rng = np.random.default_rng(3)
    eu = rng.standard_normal((inter.n_users, 8)).astype(np.float32)
    ei = rng.standard_normal((inter.n_items, 8)).astype(np.float32)
    n_keep = (24 - np.diff(inter.test_indptr)).astype(np.int32)
    parts = candidates_sharded(
        mesh, np.asarray(jax.random.PRNGKey(3)), inter, eu, ei, n_keep,
        k_c=24, num_fold=10, bin_eps=0.1,
        h_max=int(np.diff(inter.train_indptr).max()), block=16,
    )
    csum = sum(float(jax.device_get(jnp.sum(p.astype(jnp.float32)))) for p in parts)
    return losses, csum


def test_two_process_distributed_train_matches_single():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert p.returncode == 0 and lines, f"worker failed:\n{out}\n{err[-2000:]}"
        rec = json.loads(lines[-1][len("RESULT "):])
        results[rec["pid"]] = (rec["losses"], rec["cand_sum"])

    assert set(results) == {0, 1}
    # both controllers observe the same global loss trajectory + candidate draw
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=0, atol=0)
    assert results[0][1] == results[1][1]
    # and the loss decreases
    assert results[0][0][-1] < results[0][0][0]

    # single-controller reference on a same-shape mesh (4 of the parent's 8
    # virtual devices): the SPMD program is controller-count invariant
    ref_losses, ref_csum = _run_steps(expected_devices=8)
    np.testing.assert_allclose(results[0][0], ref_losses, rtol=1e-6, atol=1e-7)
    assert results[0][1] == ref_csum


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
