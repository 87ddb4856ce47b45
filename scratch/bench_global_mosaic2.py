"""Global exact mosaic (BASELINE config #3) with the persistent compile
cache enabled — measures warm throughput; pass env XRTPU_* knobs to A/B.

Usage: python scratch/bench_global_mosaic2.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import _time_fn
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

source_gm = GridMapping.regular(
    size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326"
)
tgt = GridMapping.regular(
    size=(4096, 4096), xy_min=(2000000.0, 1000000.0), xy_res=1500.0,
    crs="epsg:3035",
)
src = jnp.asarray(
    np.random.default_rng(0).random((3600, 7200), dtype=np.float32)
)

t0 = time.time()
fn = make_region_reproject_fn(
    source_gm, tgt, "bilinear", np.nan, exact=True, base_split=2, max_depth=3
)
print(f"plan {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = fn(src)
out.block_until_ready()
print(f"compile+first {time.time()-t0:.1f}s", flush=True)
dt = _time_fn(fn, src)
tag = {
    k: os.environ.get(k, "")
    for k in ("XRTPU_MOSAIC_PERPIECE", "XRTPU_MOSAIC_PROGS")
}
print(
    f"global esw-mosaic {tag}: {dt*1e3:.2f}ms -> "
    f"{4096*4096/dt/1e6:.0f} Mpix/s "
    f"finite={float(jnp.isfinite(out).mean()):.3f}",
    flush=True,
)
