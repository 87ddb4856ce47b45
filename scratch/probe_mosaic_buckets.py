"""Per-bucket timing probe for the exact global mosaic (config #3).

Usage: python scratch/probe_mosaic_buckets.py [N_PROGS]

With N_PROGS large (e.g. 99) every group body becomes its own jitted
program, so each bucket timing isolates one esw group / gather group /
singleton piece.  Body order matches the XRTPU_MOSAIC_DEBUG print order:
esw groups first, then gather groups, then singleton pieces.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["XRTPU_MOSAIC_PROGS"] = sys.argv[1] if len(sys.argv) > 1 else "99"
os.environ["XRTPU_MOSAIC_DEBUG"] = "1"

import time
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
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
print(
    f"full mosaic: {dt*1e3:.2f}ms -> {4096*4096/dt/1e6:.0f} Mpix/s",
    flush=True,
)

buckets = fn._buckets
print(f"n_buckets={len(buckets)}", flush=True)


def make_canvas():
    return jnp.full((4096, 4096), jnp.float32(np.nan), dtype=jnp.float32)


total = 0.0
for k, b in enumerate(buckets):
    dt_b = _time_fn(lambda s, _b=b: _b(s, make_canvas()), src, iters=5)
    total += dt_b
    meta = getattr(b, "_meta", ["?"])
    print(f"bucket[{k:2d}]: {dt_b*1e3:8.3f} ms  {meta}", flush=True)
print(f"sum of buckets: {total*1e3:.2f} ms", flush=True)
