"""Time the hybrid Phase-A stages separately on TPU (coords resident):
seed alone, dense alone, and the pipelined pair."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import _time_fn
from xcube_resampling_tpu.ops import rectify_ops as ro

print("devices:", jax.devices(), flush=True)

sh, sw = 1189, 1890
jj, ii = np.meshgrid(
    np.arange(sh, dtype=np.float64), np.arange(sw, dtype=np.float64),
    indexing="ij",
)
lon = 4.0 + 0.004 * ii + 0.0012 * jj + 0.08 * np.sin(jj / 173.0)
lat = 62.0 - 0.003 * jj + 0.0009 * ii + 0.05 * np.cos(ii / 211.0)
dst_h, dst_w = 1986, 1462
x_off, y_off = float(lon.min()), float(lat.max())
x_scale = (float(lon.max()) - x_off) / dst_w
y_scale = -(y_off - float(lat.min())) / dst_h

m = ro.inverse_ij_map_hybrid(
    lon, lat, 0, 0, (dst_h, dst_w), x_off, y_off, x_scale, y_scale, 1e-3
)
assert m is not None
seed = list(ro._HYBRID_SEED_JIT.values())[-1]
dense = list(ro._HYBRID_DENSE_JIT.values())[-1]

gx = jnp.asarray((lon - x_off) / x_scale, dtype=jnp.float32)
gy = jnp.asarray((lat - y_off) / y_scale, dtype=jnp.float32)
float(gx[0, 0])

cqj, cqi, meta = seed(gx, gy)
cqj.block_until_ready()

t_seed = _time_fn(lambda a, b: seed(a, b)[0], gx, gy, warmup=1, iters=5)
t_dense = _time_fn(
    lambda a, b: dense(a, b, cqj, cqi), gx, gy, warmup=1, iters=5
)


def pair(a, b):
    j, i, _ = seed(a, b)
    return dense(a, b, j, i)


t_pair = _time_fn(pair, gx, gy, warmup=1, iters=5)
print(
    f"seed {t_seed*1e3:6.1f} ms  dense {t_dense*1e3:6.1f} ms  "
    f"pair {t_pair*1e3:6.1f} ms",
    flush=True,
)
