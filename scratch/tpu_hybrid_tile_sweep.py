"""Tile-size sweep for the hybrid Phase-A dense stage, coords resident.

Measures inverse_ij_map_hybrid wall time on the OLCI-like geometry for
tile in {16, 8, 4}, with the normalize/upload excluded (the production
resident path), to see whether a smaller tile's tighter windows beat
tile=16's fewer-tiles layout.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import _time_fn  # noqa: E402
from tests.sampledata import create_s2plus_dataset  # noqa: F401  (import check)
from xcube_resampling_tpu.ops import rectify_ops as ro  # noqa: E402

print("devices:", jax.devices(), flush=True)

# OLCI-like synthetic swath: smooth irregular 2D lon/lat
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

import jax.numpy as jnp  # noqa: E402

gx = jnp.asarray((lon - x_off) / x_scale, dtype=jnp.float32)
gy = jnp.asarray((lat - y_off) / y_scale, dtype=jnp.float32)
float(gx[0, 0])  # resident

ref = None
for tile in (16, 12, 8):
    ro._HYBRID_LAST_WIN.clear()
    ro._HYBRID_SEED_JIT.clear()
    ro._HYBRID_DENSE_JIT.clear()
    t0 = time.time()
    m = ro.inverse_ij_map_hybrid(
        lon, lat, 0, 0, (dst_h, dst_w), x_off, y_off, x_scale, y_scale,
        1e-3, tile=tile,
    )
    cold = time.time() - t0
    if m is None or not ro._HYBRID_DENSE_JIT:
        print(f"tile={tile}: gate rejected / no window fits", flush=True)
        continue
    seed = list(ro._HYBRID_SEED_JIT.values())[-1]
    dense = list(ro._HYBRID_DENSE_JIT.values())[-1]

    def resident(gx, gy, _s=seed, _d=dense):
        cqj, cqi, meta = _s(gx, gy)
        return _d(gx, gy, cqj, cqi)

    dt = _time_fn(resident, gx, gy, warmup=1, iters=5)
    win = ro._HYBRID_LAST_WIN[next(iter(ro._HYBRID_LAST_WIN))]
    out = np.asarray(m.as_numpy())
    if ref is None:
        ref = out
        match = "(ref)"
    else:
        same = np.array_equal(ref, out) or (
            np.array_equal(np.isnan(ref), np.isnan(out))
            and np.allclose(ref, out, equal_nan=True, atol=1e-3)
        )
        match = f"match={same}"
    print(
        f"tile={tile}: resident {dt*1e3:7.1f} ms (build cold {cold:5.1f} s) "
        f"chosen={win} {match}",
        flush=True,
    )
