"""Dense-block matmul layout probe: why is [K,U]x[.,D] at 138 GB/s?"""
import time

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
K, U, D = 4096, 29858, 64
rng = np.random.default_rng(0)
dk_u = jnp.asarray(rng.standard_normal((K, U)), jnp.bfloat16)   # [K, U]
du_k = jnp.asarray(np.ascontiguousarray(np.asarray(dk_u, np.float32).T), jnp.bfloat16)  # [U, K]
hx = jnp.asarray(rng.standard_normal((K, D)), jnp.bfloat16)
xu = jnp.asarray(rng.standard_normal((U, D)), jnp.bfloat16)


def timed(name, f, *args):
    @jax.jit
    def loop(*a):
        def body(t, acc):
            y = f(*[x + acc.astype(x.dtype) * 1e-20 for x in a])
            return acc + y.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))

    float(loop(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / 16 * 1e3
    gb = K * U * 2 / 1e9
    print(f"{name}: {ms:.3f} ms ({gb/ms*1e3:.0f} GB/s)", flush=True)


timed("ku,kd->ud (as in ui op)", lambda d, h: jnp.einsum("ku,kd->ud", d, h, preferred_element_type=jnp.float32).astype(jnp.bfloat16), dk_u, hx)
timed("uk,kd->ud (pre-T dense)", lambda d, h: jnp.einsum("uk,kd->ud", d, h, preferred_element_type=jnp.float32).astype(jnp.bfloat16), du_k, hx)
timed("ku,ud->kd (as in iu op)", lambda d, x: jnp.einsum("ku,ud->kd", d, x, preferred_element_type=jnp.float32).astype(jnp.bfloat16), dk_u, xu)
timed("uk,ud->kd (pre-T dense)", lambda d, x: jnp.einsum("uk,ud->kd", d, x, preferred_element_type=jnp.float32).astype(jnp.bfloat16), du_k, xu)
timed("no-pref ku,kd->ud      ", lambda d, h: jnp.einsum("ku,kd->ud", d, h), dk_u, hx)
# wider D
D2 = 128
hx2 = jnp.asarray(rng.standard_normal((K, D2)), jnp.bfloat16)
timed("ku,kd->ud D=128        ", lambda d, h: jnp.einsum("ku,kd->ud", d, h, preferred_element_type=jnp.float32).astype(jnp.bfloat16), dk_u, hx2)
print("DONE", flush=True)
