"""Bench: global 0.05deg 4326 -> 3035 (BASELINE config #3) via exact paths."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import make_region_reproject_fn
from xcube_resampling_tpu.ops.esw import make_esw_reproject_fn

src_w, src_h = 7200, 3600
source_gm = GridMapping.regular(
    size=(src_w, src_h), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326"
)
out_w = out_h = 4096
target_gm = GridMapping.regular(
    size=(out_w, out_h), xy_min=(2000000.0, 1000000.0), xy_res=1500.0,
    crs="epsg:3035",
)

print("devices:", jax.devices())
src = jnp.asarray(np.random.default_rng(0).random((src_h, src_w), dtype=np.float32))

t0 = time.time()
fn = make_esw_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
print(f"whole-grid esw plan: {fn is not None} ({time.time()-t0:.1f}s)")

variants = [("bs2 d4", dict(base_split=2, max_depth=4)),
            ("bs4 d3", dict(base_split=4, max_depth=3))]
if len(sys.argv) > 1:
    variants = variants[:1]
for name, kw in variants:
    t0 = time.time()
    fn = make_region_reproject_fn(
        source_gm, target_gm, "bilinear", np.nan, exact=True, **kw
    )
    t_plan = time.time() - t0
    if fn is None:
        print(f"{name}: no plan")
        continue
    t0 = time.time()
    out = fn(src); out.block_until_ready()
    t_compile = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = fn(src); out.block_until_ready()
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{name}: plan {t_plan:.1f}s compile {t_compile:.1f}s run {dt*1e3:.2f}ms "
          f"-> {out_w*out_h/dt/1e6:.1f} Mpix/s  finite={float(jnp.isfinite(out).mean()):.3f}")
