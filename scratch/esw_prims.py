"""Microbenchmark the ESW kernel's primitive ops on the TPU: row takes,
lane takes, selects, roll passes — unfused and in fused chains — to find
what actually sets the ~5 ns/px cost of the bulk mosaic groups.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
OUT_H, OUT_W = 1024, 1024
SRC_H, SRC_W = 496, 672

probe = jax.jit(lambda acc, x: acc + x.ravel()[0])

def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    y = f(*args)
    acc = jnp.float32(0)
    acc = probe(acc, f(*args)); float(acc)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc0 = acc
        for _ in range(iters):
            acc0 = probe(acc0, f(*args))
        float(acc0)
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)
    print(f"{name:42s} {dt*1e6:9.1f} us", flush=True)
    return dt

src = jnp.asarray(rng.random((SRC_H, SRC_W), dtype=np.float32))
big = jnp.asarray(rng.random((OUT_H, SRC_W), dtype=np.float32))
fld = jnp.asarray(rng.random((128, OUT_W), dtype=np.float32))   # one row tile
flde = jnp.asarray(rng.random((128, SRC_W + 64), dtype=np.float32))
idx_rows = jnp.asarray(np.sort(rng.integers(0, SRC_H, OUT_H)).astype(np.int32))
idx_lane = jnp.asarray(np.sort(rng.integers(0, SRC_W, OUT_W)).astype(np.int32))
mask_c = jnp.asarray(rng.integers(0, 2, SRC_W).astype(bool))
mask_r = jnp.asarray(rng.integers(0, 2, OUT_H).astype(bool))
m_t = jnp.asarray(rng.random((OUT_H, 128), dtype=np.float32))

# 1. row take: (SRC_H, 128) -> (OUT_H, 128), shared across lanes
tile = src[:, :128]
timeit("row take (496,128)->(1024,128)", lambda x: jnp.take(x, idx_rows, axis=0), tile)
# 1b. row take on full width
timeit("row take (496,672)->(1024,672)", lambda x: jnp.take(x, idx_rows, axis=0), src)
# 2. lane take: (128, 736) -> (128, 1024) along lanes
timeit("lane take (128,736)->(128,1024)", lambda x: jnp.take(x, idx_lane, axis=1), flde)
# 2b. lane take of a full-height field
bigf = jnp.asarray(rng.random((OUT_H, SRC_W + 64), dtype=np.float32))
timeit("lane take (1024,736)->(1024,1024)", lambda x: jnp.take(x, idx_lane, axis=1), bigf)
# 3. one where pass over (1024, 672)
timeit("where (1024,672)", lambda a, b: jnp.where(a > 0.5, a, b), big, big * 2)
# 4. roll pass: static slice-concat + where, col-mask (axis -2 roll)
def roll_pass(x):
    k = 8
    rolled = jnp.concatenate([x[k:, :], jnp.repeat(x[-1:, :], k, axis=0)], axis=0)
    return jnp.where(mask_c[None, :], rolled, x)
timeit("col-mask roll pass (496,672)", roll_pass, src)
# 5. row-mask roll pass along rows (per-row shift of the row axis)
def roll_pass_r(x):
    k = 8
    rolled = jnp.concatenate([x[k:, :], jnp.repeat(x[-1:, :], k, axis=0)], axis=0)
    return jnp.where(mask_r[:, None], rolled, x)
timeit("row-mask roll pass (1024,672)", roll_pass_r, big)

# 6. fused vertical-pass shape: d takes + d*S wheres on one col tile
def vchain(x, m_t, d=15, S=4):
    accs = [jnp.zeros((OUT_H, 128), jnp.float32) for _ in range(S)]
    for dd in range(d):
        idx = jnp.clip(idx_rows + dd, 0, SRC_H - 1)
        taken = jnp.take(x, idx, axis=0)
        rid = (idx_rows + dd).astype(jnp.float32)[:, None]
        for s in range(S):
            accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
    out = accs[0]
    for s in range(1, S):
        out = out + accs[s]
    return out
dt = timeit("vert chain d=15 S=4 (1024,128) tile", partial(vchain), tile, m_t)
print(f"  -> per-elem {dt/ (OUT_H*128) * 1e9:.2f} ns; x6 tiles x7 pieces = {dt*42*1e3:.1f} ms", flush=True)

# 7. fused horizontal-pass shape: per row tile, d x (S+1 takes + 2S wheres)
mh = jnp.asarray(rng.random((128, SRC_W + 64), dtype=np.float32))
i0 = jnp.asarray(rng.integers(0, SRC_W, (128, OUT_W)).astype(np.int32))
def hchain(fields, mh, i0, d=15, S=4):
    base = idx_lane
    cv0 = jnp.zeros((128, OUT_W), jnp.float32)
    cv1 = cv0
    y0w = i0.astype(jnp.float32) * 0.001
    for dd in range(d):
        idx = jnp.clip(base + dd, 0, SRC_W + 63)
        mg = jnp.take(mh, idx, axis=-1)
        s0 = jnp.clip(y0w - mg, 0, S - 2)
        taken = [jnp.take(f, idx, axis=-1) for f in fields]
        a = taken[0]
        bb = taken[1]
        for s in range(1, S):
            a = jnp.where(s0 >= s - 0.5, taken[s], a)
            if s >= 2:
                bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
        colval = a + 0.5 * (bb - a)
        cv0 = jnp.where(i0 == (base + dd)[None, :], colval, cv0)
        cv1 = jnp.where((i0 + 1) == (base + dd)[None, :], colval, cv1)
    return cv0 + 0.3 * (cv1 - cv0)
fields4 = [jnp.asarray(rng.random((128, SRC_W + 64), dtype=np.float32)) for _ in range(4)]
dt = timeit("horiz chain d=15 S=4 (128,1024) tile", partial(hchain), fields4, mh, i0)
print(f"  -> per-elem {dt/(128*OUT_W)*1e9:.2f} ns; x8 tiles x7 pieces = {dt*56*1e3:.1f} ms", flush=True)

# 8. same horizontal chain but takes replaced by static rolls (what a
# shift-aligned-to-static formulation would cost)
def hchain_static(fields, mh, i0, d=15, S=4):
    cv0 = jnp.zeros((128, OUT_W), jnp.float32)
    cv1 = cv0
    y0w = i0.astype(jnp.float32) * 0.001
    for dd in range(d):
        mg = mh[:, dd : dd + OUT_W]
        s0 = jnp.clip(y0w - mg, 0, S - 2)
        taken = [f[:, dd : dd + OUT_W] for f in fields]
        a = taken[0]
        bb = taken[1]
        for s in range(1, S):
            a = jnp.where(s0 >= s - 0.5, taken[s], a)
            if s >= 2:
                bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
        colval = a + 0.5 * (bb - a)
        cv0 = jnp.where(i0 == dd, colval, cv0)
        cv1 = jnp.where((i0 + 1) == dd, colval, cv1)
    return cv0 + 0.3 * (cv1 - cv0)
fieldsw = [jnp.asarray(rng.random((128, OUT_W + 64), dtype=np.float32)) for _ in range(4)]
mhw = jnp.asarray(rng.random((128, OUT_W + 64), dtype=np.float32))
dt = timeit("horiz chain STATIC d=15 S=4", partial(hchain_static), fieldsw, mhw, i0)
print(f"  -> x8 tiles x7 pieces = {dt*56*1e3:.1f} ms", flush=True)

# 9. vertical chain with takes replaced by static rolls
def vchain_static(x, m_t, d=15, S=4):
    accs = [jnp.zeros((OUT_H, 128), jnp.float32) for _ in range(S)]
    for dd in range(d):
        taken = x[dd : dd + OUT_H, :]
        rid = (idx_rows + dd).astype(jnp.float32)[:, None]
        for s in range(S):
            accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
    out = accs[0]
    for s in range(1, S):
        out = out + accs[s]
    return out
bigtile = jnp.asarray(rng.random((OUT_H + 32, 128), dtype=np.float32))
dt = timeit("vert chain STATIC d=15 S=4", partial(vchain_static), bigtile, m_t)
print(f"  -> x6 tiles x7 pieces = {dt*42*1e3:.1f} ms", flush=True)
