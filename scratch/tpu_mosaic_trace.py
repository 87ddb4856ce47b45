"""TPU probe: per-group warm cost of the exact ESW region mosaic."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

print("devices:", jax.devices(), flush=True)

src_w, src_h = 7200, 3600
source_gm = GridMapping.regular(
    size=(src_w, src_h), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326"
)
out_w = out_h = 4096
target_gm = GridMapping.regular(
    size=(out_w, out_h), xy_min=(2000000.0, 1000000.0), xy_res=1500.0,
    crs="epsg:3035",
)
t0 = time.perf_counter()
fn = make_region_reproject_fn(source_gm, target_gm, "bilinear", np.nan, exact=True)
print(f"plan: {time.perf_counter()-t0:.1f}s", flush=True)

fv = dict(zip(fn.__code__.co_freevars, [c.cell_contents for c in fn.__closure__]))
print("closure vars:", list(fv), flush=True)
group_fns = fv["group_fns"]
pieces = fv["pieces"]
print(f"{len(group_fns)} groups, {len(pieces)} singleton pieces", flush=True)

src = jnp.asarray(np.random.default_rng(0).random((src_h, src_w), dtype=np.float32))

# full warm timing
out = fn(src); float(out[0, 0])
for _ in range(2):
    t0 = time.perf_counter()
    out = fn(src)
    float(out[0, 0])
    print(f"full warm: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

# per-group timing (synced after each)
out = jnp.full((out_h, out_w), jnp.float32(np.nan), dtype=jnp.float32)
for gi, g in enumerate(group_fns):
    o2 = g(src, out.copy())
    float(o2[0, 0])  # warm
    t0 = time.perf_counter()
    o2 = g(src, out.copy())
    float(o2[0, 0])
    print(f"group {gi}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

set_piece = fv.get("set_piece")
for pi, (r0, r1, c0, c1, win, piece_fn, statics) in enumerate(pieces):
    piece_src = src[win[0]:win[1], win[2]:win[3]] if win is not None else src
    p = piece_fn(piece_src, *statics) if statics is not None else piece_fn(piece_src)
    jax.block_until_ready(p); float(jnp.asarray(p).reshape(-1)[0])
    t0 = time.perf_counter()
    p = piece_fn(piece_src, *statics) if statics is not None else piece_fn(piece_src)
    float(jnp.asarray(p).reshape(-1)[0])
    print(f"piece {pi} ({r1-r0}x{c1-c0}): {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

print("--- group composition ---", flush=True)
for gi, g in enumerate(group_fns):
    gv = dict(zip(g.__code__.co_freevars, [c.cell_contents for c in g.__closure__]))
    # group_fn closes over (run, offs, *stacked) or (run, offs, ix_st, iy_st)
    keys = list(gv)
    offs = gv.get("offs")
    wh = ww = None
    n = None if offs is None else offs.shape[0]
    st = gv.get("stacked")
    kind = "esw" if st is not None else "gather"
    shapes = None
    if st is not None:
        shapes = [getattr(s, "shape", None) for s in st][:3]
    else:
        ix = gv.get("ix_st")
        shapes = getattr(ix, "shape", None)
    print(f"group {gi}: kind={kind} members={n} sample-shapes={shapes}", flush=True)

print("--- group kernel configs ---", flush=True)
for gi, g in enumerate(group_fns):
    gv = dict(zip(g.__code__.co_freevars, [c.cell_contents for c in g.__closure__]))
    st = gv.get("stacked")
    if st is None:
        print(f"group {gi}: gather", flush=True)
        continue
    run = gv.get("run")
    # run closes over piece_kernel (partial with cfg)
    pk = gv.get("piece_kernel")
    if pk is None and run is not None:
        print(f"group {gi}: esw (cfg not reachable)", flush=True)
        continue
    cfg = pk.keywords.get("cfg")
    d = cfg._asdict() if hasattr(cfg, "_asdict") else vars(cfg)
    keep = {k: v for k, v in d.items() if isinstance(v, (int, float, bool, str))}
    print(f"group {gi}: {keep}", flush=True)
