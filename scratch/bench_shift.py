import time
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import make_esw_reproject_fn
from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

src_w, src_h = 7200, 3600
source_gm = GridMapping.regular(size=(src_w, src_h), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
src = jnp.asarray(np.random.default_rng(0).random((src_h, src_w), dtype=np.float32))

def timeit(fn, a):
    out = fn(a); out.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time(); out = fn(a); out.block_until_ready()
        ts.append(time.time() - t0)
    return min(ts), out

cfgs = [
    ("utm", GridMapping.regular(size=(4096, 4096), xy_min=(250000.0, 5200000.0), xy_res=150.0, crs="epsg:32632")),
    ("severe-big", GridMapping.regular(size=(4096, 2048), xy_min=(900000.0, 900000.0), xy_res=875.0, crs="epsg:3035")),
]
for name, tgt in cfgs:
    npx = tgt.width * tgt.height
    t0 = time.time(); fn = make_esw_reproject_fn(source_gm, tgt, "bilinear", np.nan); t_p = time.time()-t0
    if fn is None: print(f"{name}: no plan", flush=True); continue
    t0 = time.time(); out = fn(src); out.block_until_ready(); t_c = time.time()-t0
    dt, out = timeit(fn, src)
    print(f"{name} esw: plan {t_p:.1f}s compile {t_c:.1f}s run {dt*1e3:.2f}ms -> {npx/dt/1e6:.0f} Mpix/s finite={float(jnp.isfinite(out).mean()):.3f}", flush=True)

tgt = GridMapping.regular(size=(4096, 4096), xy_min=(2000000.0, 1000000.0), xy_res=1500.0, crs="epsg:3035")
t0 = time.time()
fn = make_region_reproject_fn(source_gm, tgt, "bilinear", np.nan, exact=True, base_split=2, max_depth=3)
t_p = time.time()-t0
print(f"global plan done {t_p:.1f}s", flush=True)
t0 = time.time(); out = fn(src); out.block_until_ready(); t_c = time.time()-t0
dt, out = timeit(fn, src)
print(f"global-3035 esw-region: plan {t_p:.1f}s compile {t_c:.1f}s run {dt*1e3:.2f}ms -> {4096*4096/dt/1e6:.0f} Mpix/s finite={float(jnp.isfinite(out).mean()):.3f}", flush=True)
