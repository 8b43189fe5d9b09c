"""SerenEnhance at >50k users: vectorized assembly timing + transformer training."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.models.seren_transformer import SerenTrainer, SerenTransformer
from serendipity_tpu.rec.seren_data import (
    build_seren_test_batch, build_seren_training_batches,
)

print(jax.devices(), flush=True)
inter = synthetic_interactions(60000, 20000, avg_degree=30, seed=0, n_clusters=32)
print(f"graph {inter.n_users}x{inter.n_items}, nnz={inter.n_train + inter.n_test}",
      flush=True)
rng = np.random.default_rng(0)
dim = 128
ei = rng.standard_normal((inter.n_items, dim)).astype(np.float32)

t0 = time.time()
batch = build_seren_training_batches(inter, ei, n_reviews=20, n_pos=50, seed=0)
t_asm = time.time() - t0
gb = sum(v.nbytes for v in batch.values()) / 2**30
print(f"assembly (60k users, vectorized): {t_asm:.1f}s -> {gb:.1f} GiB of tensors",
      flush=True)

t0 = time.time()
test_b = build_seren_test_batch(inter, ei, n_reviews=20, n_cand=100, seed=1)
print(f"test-batch assembly: {time.time()-t0:.1f}s ({len(test_b['users'])} users)",
      flush=True)

model = SerenTransformer(embed_dim=dim, n_reviews=20)
trainer = SerenTrainer(model=model, lr=1e-3, n_pos=50)
params, opt_state = trainer.init(jax.random.PRNGKey(0), 20, 100, dim)
step = trainer.make_train_step()
key = jax.random.PRNGKey(1)
bs = 512
n_steps = 60
t0 = time.time()
losses = []
for i in range(n_steps):
    s = (i * bs) % (inter.n_users - bs)
    jb = {k: jnp.asarray(v[s:s + bs]) for k, v in batch.items()}
    params, opt_state, key, loss = step(params, opt_state, jb, key)
    if i % 20 == 0 or i == n_steps - 1:
        losses.append((i, float(loss)))
        print(f"step {i}: loss={float(loss):.4f}", flush=True)
print(f"train {n_steps} steps x {bs}: {time.time()-t0:.1f}s", flush=True)

ev = trainer.make_eval_step()
hrs = []
for s in range(0, 4096, 512):
    scores = np.asarray(ev(params, jnp.asarray(test_b["history"][s:s + 512]),
                           jnp.asarray(test_b["y_cand"][s:s + 512])))
    hrs.append(SerenTrainer.ranking_metrics(scores)["hr@10"])
print(f"HR@10 over 4096 eval users: {np.mean(hrs):.3f}", flush=True)
print("DONE", flush=True)
