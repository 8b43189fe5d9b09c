"""Raw achievable HBM stream + MXU peak on this chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
rng = np.random.default_rng(0)


def timed(name, make_loop, bytes_or_flops, unit):
    loop = make_loop()
    float(loop())
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop())
        best = min(best, time.perf_counter() - t0)
    per = best / 16
    print(f"{name}: {per*1e3:.3f} ms -> {bytes_or_flops/per/1e9:.0f} G{unit}/s", flush=True)


# 1 GB f32 reduction (pure read stream)
x = jnp.asarray(rng.standard_normal((256 * 1024 * 1024,)), jnp.float32)  # 1 GiB


def mk_sum():
    @jax.jit
    def loop(x):
        def body(t, acc):
            return acc + jnp.sum(x * (1.0 + acc * 1e-30))
        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))
    return lambda: loop(x)


timed("1GiB f32 read-reduce", mk_sum, x.nbytes, "B")

# bf16 square matmul peak
n = 8192
a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)


def mk_mm():
    @jax.jit
    def loop(a, b):
        def body(t, acc):
            c = jax.lax.dot_general(
                a, b + acc.astype(b.dtype) * 1e-30, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + c.sum()
        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))
    return lambda: loop(a, b)


timed("8192^3 bf16 matmul", mk_mm, 2 * n**3, "FLOP")

# the prop-shaped matmul WITHOUT any loop-carried perturbation of the big
# operand: [K, U] treated as activations changing per iter on the SMALL side
K, U, D = 4096, 29858, 64
dk_u = jnp.asarray(rng.standard_normal((K, U)), jnp.bfloat16)
hx = jnp.asarray(rng.standard_normal((K, D)), jnp.bfloat16)


def mk_prop():
    @jax.jit
    def loop(d, h):
        def body(t, acc):
            y = jnp.einsum(
                "ku,kd->ud", d, h + acc.astype(h.dtype) * 1e-30,
                preferred_element_type=jnp.float32,
            )
            return acc + y.sum()
        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))
    return lambda: loop(dk_u, hx)


timed("[4096,29858]x[4096,64]", mk_prop, K * U * 2, "B")
print("DONE", flush=True)
