import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from bench import _time_fn
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
tgt = GridMapping.regular(size=(4096, 4096), xy_min=(2000000.0, 1000000.0), xy_res=1500.0, crs="epsg:3035")
src = jnp.asarray(np.random.default_rng(0).random((3600, 7200), dtype=np.float32))

t0 = time.time()
fn = make_region_reproject_fn(source_gm, tgt, "bilinear", np.nan, exact=True, base_split=2, max_depth=3)
print(f"plan {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); out = fn(src); out.block_until_ready(); print(f"compile+first {time.time()-t0:.1f}s", flush=True)
dt = _time_fn(fn, src)
print(f"global esw-mosaic: {dt*1e3:.2f}ms -> {4096*4096/dt/1e6:.0f} Mpix/s finite={float(jnp.isfinite(out).mean()):.3f}", flush=True)
