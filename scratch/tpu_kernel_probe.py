import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from xcube_resampling_tpu.ops import rectify_ops
print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
src_h = src_w = 1920
gx = np.cumsum(rng.random((src_h, src_w)), axis=1).astype(np.float32)
gy = np.cumsum(rng.random((src_h, src_w)), axis=0).astype(np.float32)

n_tj, n_ti = 249, 184
T = n_tj * n_ti
tjs = np.repeat(np.arange(n_tj, dtype=np.int32), n_ti)
tis = np.tile(np.arange(n_ti, dtype=np.int32), n_tj)
bjs = rng.integers(0, src_h - 48, T).astype(np.int32)
bis = rng.integers(0, src_w - 48, T).astype(np.int32)

kern = rectify_ops._phase_a_tiled_jit()
for win in (16, 20):
    args = (jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(tjs), jnp.asarray(tis),
            jnp.asarray(bjs), jnp.asarray(bis), jnp.float32(1e-3))
    t0 = time.perf_counter()
    o = kern(*args, tile=8, win=win, nqi=src_w - 1)
    float(jnp.nansum(o[0]))
    print(f"win={win} cold: {time.perf_counter()-t0:.2f}s", flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        o = kern(*args, tile=8, win=win, nqi=src_w - 1)
        float(jnp.nansum(o[0]))
        print(f"win={win} warm: {time.perf_counter()-t0:.3f}s", flush=True)
