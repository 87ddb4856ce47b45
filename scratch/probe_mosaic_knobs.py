"""Knob sweep for the exact global mosaic (config #3): base_split /
max_depth / op_budget vs warm device time.

Usage: python scratch/probe_mosaic_knobs.py BASE_SPLIT MAX_DEPTH OP_BUDGET [N_PROGS]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

base_split = int(sys.argv[1]) if len(sys.argv) > 1 else 2
max_depth = int(sys.argv[2]) if len(sys.argv) > 2 else 4
op_budget = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
if len(sys.argv) > 4:
    os.environ["XRTPU_MOSAIC_PROGS"] = sys.argv[4]
os.environ.setdefault("XRTPU_MOSAIC_DEBUG", "1")

import numpy as np
import jax
import jax.numpy as jnp

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import _time_fn
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import make_esw_region_fn

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
fn = make_esw_region_fn(
    source_gm, tgt, "bilinear", np.nan,
    base_split=base_split, max_depth=max_depth, op_budget=op_budget,
)
print(f"plan {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
out = fn(src)
out.block_until_ready()
print(f"compile+first {time.time()-t0:.1f}s", flush=True)

dt = _time_fn(fn, src)
print(
    f"[knobs split={base_split} depth={max_depth} budget={op_budget}] "
    f"full mosaic: {dt*1e3:.2f}ms -> {4096*4096/dt/1e6:.0f} Mpix/s",
    flush=True,
)
