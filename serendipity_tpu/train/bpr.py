"""BPR training: one `jit`-compiled epoch (scan over steps), on-device sampling.

Replaces the reference's epoch structure — host C++ rejection sampler + shuffle +
minibatch loop + per-batch `.to(device)` (`Procedure.BPR_train_original`,
`Procedure.py:26-57`; TF threaded sampler overlap, `LightGCN.py:386-429`) — with a
single device computation per epoch: `lax.scan` over steps, each step drawing its
(user, pos, neg) batch with `serendipity_tpu.ops.sampling` and applying one Adam
update.  There is no host<->device traffic inside an epoch at all, which removes the
~16 s/epoch CPU sampling overhead the reference README reports.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from serendipity_tpu.config import ExperimentConfig
from serendipity_tpu.models.lightgcn import EmbeddingModel, Params, init_params
from serendipity_tpu.ops.sampling import sample_bpr_batch
from serendipity_tpu.train.device import DeviceData


@dataclass
class TrainState:
    params: Params
    opt_state: Any
    key: jax.Array
    epoch: int = 0
    best_metric: float = 0.0
    best_epoch: int = -1
    stopping_step: int = 0
    history: List[Dict[str, float]] = field(default_factory=list)


class BPRTrainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        model: EmbeddingModel,
        data: DeviceData,
        batch_sharding=None,
        param_shardings=None,
    ):
        """`batch_sharding`/`param_shardings` activate the multi-chip path
        (`parallel/sharded.py`): sampled batches get a P('data') constraint and the
        updated tables keep their row sharding; everything else — scan-chunked
        epochs, early stopping, checkpointing — is identical on 1 chip or a mesh."""
        self.cfg = cfg
        self.model = model
        self.data = data
        self.batch_sharding = batch_sharding
        self.param_shardings = param_shardings
        self.optimizer = optax.adam(cfg.train.lr)
        tcfg = cfg.train
        steps = tcfg.steps_per_epoch or max(1, -(-data.n_train // tcfg.batch_size))
        # round the epoch up to whole scan chunks (see TrainConfig.scan_chunk)
        self.chunk = max(1, min(tcfg.scan_chunk, steps))
        self.n_chunks = -(-steps // self.chunk)
        self.steps_per_epoch = self.n_chunks * self.chunk
        self._chunk_fn = jax.jit(self._build_chunk_fn(), donate_argnums=(0, 1))

    def init_state(self, pretrained=None) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.train.seed)
        k_init, k_loop = jax.random.split(key)
        # model row counts, not dataset counts: on a mesh the tables are padded to
        # the device-count multiple (pad rows get zero grad and are never sampled)
        params = init_params(
            k_init, self.cfg.model, self.model.n_users, self.model.n_items, pretrained
        )
        if self.param_shardings is not None:
            params = {
                k: jax.device_put(v, self.param_shardings[k])
                for k, v in params.items()
            }
        return TrainState(
            params=params, opt_state=self.optimizer.init(params), key=k_loop
        )

    def _build_chunk_fn(self) -> Callable:
        model, data, cfg = self.model, self.data, self.cfg
        tcfg = cfg.train
        steps = self.chunk

        def chunk_fn(params, opt_state, key, consts):
            # bind the SpMM closures (and the sampler bitmap) from the consts
            # ARGUMENT at trace time (`ops/spmm_common.SplitSpmm`): the layout
            # arrays enter the step as inputs, not as HLO constants — required
            # under multi-controller `jax.distributed` and keeps hundreds of MB
            # out of the remote-compiled HLO
            spmm_consts, bitmap = consts
            if data.spmm_split is not None:
                spmm_ops = data.spmm_split.bind(spmm_consts)
            else:
                spmm_ops = data.spmm_ops

            def step(carry, step_key):
                params, opt_state = carry
                k_sample, k_drop = jax.random.split(step_key)
                users, pos, neg = sample_bpr_batch(
                    k_sample,
                    data.valid_users,
                    data.train_indptr,
                    data.train_indices,
                    data.n_items,
                    tcfg.batch_size,
                    tcfg.neg_resample_rounds,
                    search_iters=data.search_iters,
                    bitmap=bitmap,
                )
                if self.batch_sharding is not None:
                    users = jax.lax.with_sharding_constraint(users, self.batch_sharding)
                    pos = jax.lax.with_sharding_constraint(pos, self.batch_sharding)
                    neg = jax.lax.with_sharding_constraint(neg, self.batch_sharding)

                def loss_fn(p):
                    return model.bpr_loss(
                        p, data.adj, users, pos, neg, tcfg.l2_decay,
                        dropout_key=k_drop if model.edge_dropout > 0 else None,
                        spmm_ops=spmm_ops,
                    )

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if self.param_shardings is not None:
                    params = {
                        k: jax.lax.with_sharding_constraint(v, self.param_shardings[k])
                        for k, v in params.items()
                    }
                return (params, opt_state), (loss, aux["mf_loss"])

            key, sub = jax.random.split(key)
            step_keys = jax.random.split(sub, steps)
            (params, opt_state), (losses, mf_losses) = jax.lax.scan(
                step, (params, opt_state), step_keys
            )
            return params, opt_state, key, jnp.mean(losses), jnp.mean(mf_losses)

        return chunk_fn

    @property
    def step_consts(self):
        """The argument-passed constants of one chunk call: (SpMM layout
        pytree, sampler bitmap) — see chunk_fn."""
        return (
            self.data.spmm_split.consts if self.data.spmm_split is not None else None,
            self.data.train_bitmap,
        )

    def train_epoch(self, state: TrainState) -> Tuple[TrainState, float, float]:
        consts = self.step_consts
        losses, mf_losses = [], []
        for _ in range(self.n_chunks):
            params, opt_state, key, loss, mf_loss = self._chunk_fn(
                state.params, state.opt_state, state.key, consts
            )
            state.params, state.opt_state, state.key = params, opt_state, key
            losses.append(loss)
            mf_losses.append(mf_loss)
        state.epoch += 1
        return state, float(jnp.mean(jnp.stack(losses))), float(
            jnp.mean(jnp.stack(mf_losses))
        )

    def fit(
        self,
        state: TrainState,
        evaluator: Optional["Evaluator"] = None,
        log_fn: Callable[[str], None] = print,
        metrics_fn: Optional[Callable[[Dict[str, float]], None]] = None,
        checkpoint_dir: Optional[str] = None,
    ) -> TrainState:
        """Train with periodic evaluation + early stopping.

        Early-stopping contract of `utility/helper.py:38-53` / `Procedure`-style
        patience: track best recall@Ks[0]; stop after `patience` successive
        non-improving evaluations.
        """
        import math

        tcfg = self.cfg.train
        k0 = self.cfg.eval.topks[0]
        # real copy: the epoch fn donates state.params, and this fallback must
        # survive runs where no eval improves (e.g. resume from the best epoch)
        best_params = jax.tree.map(jnp.copy, state.params)
        from serendipity_tpu.utils.timing import timer

        for _ in range(state.epoch, tcfg.epochs):
            t0 = time.perf_counter()
            with timer("train"):
                state, loss, mf_loss = self.train_epoch(state)
            dt = time.perf_counter() - t0
            if not math.isfinite(loss):
                # failure detection (role of the reference NaN abort,
                # `LightGCN.py:609-611`): stop, keep the best finite params
                log_fn(f"ERROR: non-finite loss {loss} at epoch {state.epoch}; aborting")
                state.params = best_params
                break
            rec: Dict[str, float] = {"epoch": state.epoch, "loss": loss, "time": dt}
            # eval_every <= 0 = never evaluate during training (final eval in
            # the runner still runs); a 0 must not crash on the modulo
            if (evaluator is not None and tcfg.eval_every > 0
                    and state.epoch % tcfg.eval_every == 0):
                with timer("eval"):
                    metrics = evaluator.evaluate(state.params)
                rec.update(metrics)
                cur = metrics[f"recall@{k0}"]
                log_fn(
                    f"epoch {state.epoch}: loss={loss:.5f} "
                    f"recall@{k0}={cur:.5f} ndcg@{k0}={metrics[f'ndcg@{k0}']:.5f} "
                    f"({dt:.2f}s/epoch) {timer.dict()}"
                )
                timer.zero()
                if cur > state.best_metric:
                    state.best_metric = cur
                    state.best_epoch = state.epoch
                    state.stopping_step = 0
                    # real device copy — the epoch fn donates its inputs, so holding
                    # the original buffers here would leave dangling references
                    best_params = jax.tree.map(jnp.copy, state.params)
                    if checkpoint_dir:
                        from serendipity_tpu.train.checkpoint import save_checkpoint

                        with timer("checkpoint"):
                            save_checkpoint(checkpoint_dir, state)
                else:
                    state.stopping_step += 1
                    if state.stopping_step >= tcfg.patience:
                        log_fn(
                            f"early stop at epoch {state.epoch} "
                            f"(best recall@{k0}={state.best_metric:.5f} "
                            f"@ epoch {state.best_epoch})"
                        )
                        state.params = best_params
                        break
            state.history.append(rec)
            if metrics_fn is not None:
                metrics_fn(rec)
        else:
            if evaluator is not None and state.best_epoch >= 0:
                state.params = best_params
        return state

    def export_embeddings(self, state: TrainState):
        """Final propagated (user, item) embeddings — the `emb_user.npy` /
        `emb_item.npy` contract (`LightGCN.py:707-708`, `code/main.py:40-41`)."""
        import numpy as np

        from serendipity_tpu.train.device import propagate_fn

        all_u, all_i = propagate_fn(self.model, self.data)(state.params)
        # numpy has no bfloat16 — export as f32 regardless of compute dtype
        return (
            np.asarray(all_u.astype(jnp.float32)),
            np.asarray(all_i.astype(jnp.float32)),
        )
