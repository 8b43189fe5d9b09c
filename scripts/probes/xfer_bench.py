import time
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
x = np.random.default_rng(0).integers(0, 1000, (52643, 1000)).astype(np.int32)  # 210 MB
t0 = time.time(); xd = jnp.asarray(x); xd.block_until_ready()
t_up = time.time() - t0
s = float(xd.sum())   # force real completion per memory notes
t0 = time.time(); xh = np.asarray(xd)
t_dn = time.time() - t0
print(f"upload 210MB: {t_up:.2f}s ({210/t_up:.0f} MB/s)  download: {t_dn:.2f}s ({210/t_dn:.0f} MB/s)", flush=True)
# second round (warm path)
t0 = time.time(); yd = jnp.asarray(xh); yd.block_until_ready(); print(f"upload2: {time.time()-t0:.2f}s", flush=True)
t0 = time.time(); np.asarray(yd); print(f"download2: {time.time()-t0:.2f}s", flush=True)
