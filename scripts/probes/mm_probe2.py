"""Feature-major (d-major) matmul forms for the hybrid dense block."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
K, U, D = 4096, 29858, 64
rng = np.random.default_rng(0)
dk_u = jnp.asarray(rng.standard_normal((K, U)), jnp.bfloat16)
hx_kd = jnp.asarray(rng.standard_normal((K, D)), jnp.bfloat16)
hx_dk = jnp.asarray(np.ascontiguousarray(np.asarray(hx_kd, np.float32).T), jnp.bfloat16)
xu_ud = jnp.asarray(rng.standard_normal((U, D)), jnp.bfloat16)
xu_du = jnp.asarray(np.ascontiguousarray(np.asarray(xu_ud, np.float32).T), jnp.bfloat16)


def timed(name, f, *args):
    @jax.jit
    def loop(d, *a):
        def body(t, acc):
            y = f(d, *[x + acc.astype(x.dtype) * 1e-30 for x in a])
            return acc + y.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))

    float(loop(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / 16 * 1e3
    print(f"{name}: {ms:.3f} ms ({K*U*2/1e9/ms*1e3:.0f} GB/s)", flush=True)


pf = dict(preferred_element_type=jnp.float32)
timed("kd,ku->du (out [D,U])", lambda d, h: jnp.einsum("kd,ku->du", h, d, **pf).astype(jnp.bfloat16), dk_u, hx_kd)
timed("dk,ku->du (both d-major)", lambda d, h: jnp.einsum("dk,ku->du", h, d, **pf).astype(jnp.bfloat16), dk_u, hx_dk)
timed("du,ku->dk (iu, d-major)", lambda d, x: jnp.einsum("du,ku->dk", x, d, **pf).astype(jnp.bfloat16), dk_u, xu_du)
timed("ud,ku->dk ", lambda d, x: jnp.einsum("ud,ku->dk", x, d, **pf).astype(jnp.bfloat16), dk_u, xu_ud)
# f32 output (skip the bf16 cast of the big [D,U] result)
timed("kd,ku->du f32 out", lambda d, h: jnp.einsum("kd,ku->du", h, d, **pf), dk_u, hx_kd)
print("DONE", flush=True)
