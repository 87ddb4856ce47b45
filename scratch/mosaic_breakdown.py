"""Measure the exact global mosaic's per-bucket / per-group cost on TPU.

Round-4 probe for the singular-sliver ceiling work (VERDICT #1): where do
the ~100 ms of the warm global exact mosaic go?  Sets XRTPU_MOSAIC_PROGS
high so every group body becomes its own bucket program, then times each
bucket separately (min over windows of batched dispatches).
"""
import os, sys, time, json
os.environ.setdefault("XRTPU_MOSAIC_DEBUG", "1")
os.environ.setdefault("XRTPU_MOSAIC_PROGS", "64")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import make_esw_region_fn

source_gm = GridMapping.regular(size=(7200,3600), xy_min=(-180.0,-90.0), xy_res=0.05, crs="epsg:4326")
target_gm = GridMapping.regular(size=(4096,4096), xy_min=(2000000.0,1000000.0), xy_res=1500.0, crs="epsg:3035")

t0 = time.perf_counter()
fn = make_esw_region_fn(source_gm, target_gm, "bilinear", np.nan)
print(f"plan wall: {time.perf_counter()-t0:.2f} s", flush=True)

src = jnp.asarray(np.random.default_rng(0).random((3600, 7200), dtype=np.float32))

probe = jax.jit(lambda acc, x: acc + jnp.nan_to_num(x).ravel()[0])

def sync(x):
    return float(jnp.nan_to_num(x).ravel()[0])

t0 = time.perf_counter()
out = fn(src); sync(out)
print(f"first call: {time.perf_counter()-t0:.2f} s", flush=True)

# whole-fn warm timing (min of 3 windows of 5 batched dispatches)
acc = jnp.float32(0)
for _ in range(2):
    acc = probe(acc, fn(src))
float(acc)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        acc = probe(acc, fn(src))
    float(acc)
    times.append((time.perf_counter()-t0)/5)
dt = min(times)
print(f"warm whole: {dt*1e3:.1f} ms = {4096*4096/dt/1e6:.0f} Mpix/s", flush=True)

# per-bucket timing: thread a canvas through ONE bucket repeatedly.
# Donation keeps it in place; re-make the canvas each window.
h, w = target_gm.height, target_gm.width
for bi, bf in enumerate(fn._buckets):
    meta = bf._meta
    times = []
    for _ in range(3):
        out = jnp.full((h, w), jnp.float32(np.nan))
        out = bf(src, out)  # warm / donate cycle
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(5):
            out = bf(src, out)
            acc = probe(acc, out)
        float(acc)
        times.append((time.perf_counter()-t0)/5)
    dt = min(times)
    print(f"bucket {bi}: {dt*1e3:6.2f} ms  {meta}", flush=True)

# dispatch-overhead baseline: the probe program alone
acc = jnp.float32(0)
t0 = time.perf_counter()
for _ in range(50):
    acc = probe(acc, src)
float(acc)
print(f"probe-only dispatch: {(time.perf_counter()-t0)/50*1e3:.2f} ms", flush=True)
