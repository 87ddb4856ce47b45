"""Compare SRW (two-pass filter) vs ESW (exact) on the bench configs."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import make_srw_reproject_fn, make_region_reproject_fn
from xcube_resampling_tpu.ops.esw import make_esw_reproject_fn, plan_esw
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn

print("devices:", jax.devices())

src_w, src_h = 7200, 3600
source_gm = GridMapping.regular(
    size=(src_w, src_h), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326"
)
src = jnp.asarray(np.random.default_rng(0).random((src_h, src_w), dtype=np.float32))

def timeit(fn, *a):
    out = fn(*a); out.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time(); out = fn(*a); out.block_until_ready()
        ts.append(time.time() - t0)
    return min(ts)

configs = [
    ("utm-headline", GridMapping.regular(
        size=(4096, 4096), xy_min=(250000.0, 5200000.0), xy_res=150.0,
        crs="epsg:32632")),
    ("global-3035", GridMapping.regular(
        size=(4096, 4096), xy_min=(2000000.0, 1000000.0), xy_res=1500.0,
        crs="epsg:3035")),
]

for name, target_gm in configs:
    npx = target_gm.width * target_gm.height
    for label, builder in [
        ("srw", lambda: make_srw_reproject_fn(source_gm, target_gm, "bilinear", np.nan)),
        ("esw", lambda: make_esw_reproject_fn(source_gm, target_gm, "bilinear", np.nan)),
        ("esw-region", lambda: make_region_reproject_fn(
            source_gm, target_gm, "bilinear", np.nan, exact=True)),
        ("gather", lambda: make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)),
    ]:
        t0 = time.time()
        fn = builder()
        t_plan = time.time() - t0
        if fn is None:
            print(f"{name} {label}: no plan ({t_plan:.1f}s)")
            continue
        t0 = time.time()
        out = fn(src); out.block_until_ready()
        t_compile = time.time() - t0
        dt = timeit(fn, src)
        print(f"{name} {label}: plan {t_plan:.1f}s compile {t_compile:.1f}s "
              f"run {dt*1e3:.2f}ms -> {npx/dt/1e6:.0f} Mpix/s "
              f"finite={float(jnp.isfinite(out).mean()):.3f}")
