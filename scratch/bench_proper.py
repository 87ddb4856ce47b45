import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from bench import _time_fn
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import make_esw_reproject_fn
from xcube_resampling_tpu.ops.srw import make_srw_reproject_fn
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
src = jnp.asarray(np.random.default_rng(0).random((3600, 7200), dtype=np.float32))
batch = jnp.stack([src, src*2, src*3, src*4])

cfgs = [
    ("utm", GridMapping.regular(size=(4096, 4096), xy_min=(250000.0, 5200000.0), xy_res=150.0, crs="epsg:32632")),
    ("severe-big", GridMapping.regular(size=(4096, 2048), xy_min=(900000.0, 900000.0), xy_res=875.0, crs="epsg:3035")),
]
for name, tgt in cfgs:
    npx = tgt.width * tgt.height
    for label, mk in [("esw", make_esw_reproject_fn), ("srw", make_srw_reproject_fn), ("gather", make_fused_reproject_fn)]:
        fn = mk(source_gm, tgt, "bilinear", np.nan)
        if fn is None:
            print(f"{name} {label}: no plan", flush=True); continue
        dt = _time_fn(fn, src)
        dtb = _time_fn(fn, batch)
        print(f"{name} {label}: {dt*1e3:.2f}ms -> {npx/dt/1e6:.0f} Mpix/s | batch4 {dtb*1e3:.2f}ms -> {4*npx/dtb/1e6:.0f} Mpix/s", flush=True)
