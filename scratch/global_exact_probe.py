"""Measure the exact global mosaic (BASELINE config #3) on the real TPU.

Usage: XRTPU_ESW_STATIC={0|1|unset} python scratch/global_exact_probe.py
Prints planning time, compile+first-dispatch time, and warm Mpix/s.
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

src_w, src_h = 7200, 3600
source_gm = GridMapping.regular(
    size=(src_w, src_h), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326"
)
out_w = out_h = 4096
target_gm = GridMapping.regular(
    size=(out_w, out_h),
    xy_min=(2000000.0, 1000000.0),
    xy_res=1500.0,
    crs="epsg:3035",
)
src = jnp.asarray(np.random.default_rng(0).random((src_h, src_w), dtype=np.float32))

print(f"XRTPU_ESW_STATIC={os.environ.get('XRTPU_ESW_STATIC', '<unset>')}", flush=True)
t0 = time.perf_counter()
fn = make_region_reproject_fn(source_gm, target_gm, "bilinear", np.nan, exact=True)
print(f"plan: {time.perf_counter()-t0:.1f} s", flush=True)

# block_until_ready is a no-op on the remote backend: chain a scalar probe
# and fetch it to synchronize device work (same trick as bench.py)
probe = jax.jit(lambda acc, x: acc + x.ravel()[0])

t0 = time.perf_counter()
float(probe(jnp.float32(0), fn(src)))
print(f"first dispatch (compile): {time.perf_counter()-t0:.1f} s", flush=True)

iters = 5
times = []
for _ in range(3):
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = probe(acc, fn(src))
    float(acc)
    times.append((time.perf_counter() - t0) / iters)
dt = min(times)
print(f"warm: {dt*1e3:.1f} ms = {out_w*out_h/dt/1e6:.1f} Mpix/s "
      f"(all: {[f'{t*1e3:.0f}' for t in times]})", flush=True)
out = fn(src)
arr = np.asarray(out)
print(f"checksum: nan={np.isnan(arr).mean():.4f} sum={np.nansum(arr):.6e}", flush=True)
