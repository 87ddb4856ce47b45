"""ESW primitive microbenchmarks, dispatch-amortized: each op is chained
K times inside ONE jit (scalar feedback forces sequential execution), and
the per-op cost is the K=16 vs K=4 slope — dispatch overhead cancels.
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

def slope(name, make_chain, *args, iters=8):
    """make_chain(K) -> jitted fn(*args) running the op K times serially."""
    res = {}
    for K in (4, 16):
        f = make_chain(K)
        acc = jnp.float32(0)
        acc = probe(acc, f(*args)); float(acc)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            a0 = acc
            for _ in range(iters):
                a0 = probe(a0, f(*args))
            float(a0)
            times.append((time.perf_counter() - t0) / iters)
        res[K] = min(times)
    per_op = (res[16] - res[4]) / 12
    print(f"{name:44s} {per_op*1e6:8.1f} us/op", flush=True)
    return per_op

tile = jnp.asarray(rng.random((SRC_H, 128), dtype=np.float32))
src = jnp.asarray(rng.random((SRC_H, SRC_W), dtype=np.float32))
big = jnp.asarray(rng.random((OUT_H, SRC_W), dtype=np.float32))
idx_rows_np = np.sort(rng.integers(0, SRC_H - 1, OUT_H)).astype(np.int32)
idx_rows = jnp.asarray(idx_rows_np)
idx_lane = jnp.asarray(np.sort(rng.integers(0, SRC_W - 1, OUT_W)).astype(np.int32))
mask_c = jnp.asarray(rng.integers(0, 2, SRC_W).astype(bool))
flde = jnp.asarray(rng.random((128, SRC_W + 64), dtype=np.float32))

def chain_rowtake(K):
    @jax.jit
    def f(x, idx):
        y = jnp.zeros((OUT_H, 128), jnp.float32)
        for k in range(K):
            i2 = jnp.clip(idx + (y[0, 0] * 0).astype(jnp.int32) + (k & 1), 0, SRC_H - 1)
            y = jnp.take(x, i2, axis=0)
        return y
    return f

def chain_rowtake_w(K):
    @jax.jit
    def f(x, idx):
        y = jnp.zeros((OUT_H, SRC_W), jnp.float32)
        for k in range(K):
            i2 = jnp.clip(idx + (y[0, 0] * 0).astype(jnp.int32) + (k & 1), 0, SRC_H - 1)
            y = jnp.take(x, i2, axis=0)
        return y
    return f

def chain_lanetake(K):
    @jax.jit
    def f(x, idx):
        y = jnp.zeros((128, OUT_W), jnp.float32)
        for k in range(K):
            i2 = jnp.clip(idx + (y[0, 0] * 0).astype(jnp.int32) + (k & 1), 0, SRC_W + 63)
            y = jnp.take(x, i2, axis=1)
        return y
    return f

def chain_where(K):
    @jax.jit
    def f(a, b):
        y = b
        for k in range(K):
            y = jnp.where(a > 0.5 + 1e-6 * k, a, y * 1.0000001)
        return y
    return f

def chain_roll(K):
    @jax.jit
    def f(x):
        y = x
        for k in range(K):
            kk = 8
            rolled = jnp.concatenate(
                [y[kk:, :], jnp.repeat(y[-1:, :], kk, axis=0)], axis=0
            )
            y = jnp.where(mask_c[None, :], rolled, y) * 1.0000001
        return y
    return f

slope("row take (496,128)->(1024,128)", chain_rowtake, tile, idx_rows)
slope("row take (496,672)->(1024,672)", chain_rowtake_w, src, idx_rows)
slope("lane take (128,736)->(128,1024)", chain_lanetake, flde, idx_lane)
slope("where (1024,672)", chain_where, big, big * 0.5)
slope("roll pass (496,672)", chain_roll, src)

# full chains (the real unit of work): one col tile vertical, one row tile
# horizontal, K repeats with scalar feedback
m_t = jnp.asarray((idx_rows_np[:, None] + rng.integers(0, 15, (OUT_H, 128))).astype(np.float32))

def chain_vert(K, d=15, S=4):
    @jax.jit
    def f(x, m_t, idx):
        out = jnp.zeros((OUT_H, 128), jnp.float32)
        for k in range(K):
            accs = [jnp.zeros((OUT_H, 128), jnp.float32) for _ in range(S)]
            base = idx + (out[0, 0] * 0).astype(jnp.int32)
            for dd in range(d):
                i2 = jnp.clip(base + dd, 0, SRC_H - 1)
                taken = jnp.take(x, i2, axis=0)
                rid = (base + dd).astype(jnp.float32)[:, None]
                for s in range(S):
                    accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
            out = accs[0]
            for s in range(1, S):
                out = out + accs[s]
        return out
    return f

pv = slope("vert chain d=15 S=4 (1024,128)", chain_vert, tile, m_t, idx_rows)
print(f"  -> x6 tiles x7 pieces = {pv*42*1e3:.2f} ms", flush=True)

i0 = jnp.asarray(
    (np.sort(rng.integers(0, SRC_W - 1, OUT_W))[None, :] + rng.integers(0, 15, (128, OUT_W))).astype(np.int32)
)
mh = jnp.asarray(rng.random((128, SRC_W + 64), dtype=np.float32))
fields4 = [jnp.asarray(rng.random((128, SRC_W + 64), dtype=np.float32)) for _ in range(4)]

def chain_horiz(K, d=15, S=4):
    @jax.jit
    def f(mh, i0, idx, *fields):
        out = jnp.zeros((128, OUT_W), jnp.float32)
        y0w = i0.astype(jnp.float32) * 0.001
        for k in range(K):
            base = idx + (out[0, 0] * 0).astype(jnp.int32)
            cv0 = jnp.zeros((128, OUT_W), jnp.float32)
            cv1 = cv0
            for dd in range(d):
                i2 = jnp.clip(base + dd, 0, SRC_W + 63)
                mg = jnp.take(mh, i2, axis=-1)
                s0 = jnp.clip(y0w - mg, 0, S - 2)
                taken = [jnp.take(f_, i2, axis=-1) for f_ in fields]
                a = taken[0]
                bb = taken[1]
                for s in range(1, S):
                    a = jnp.where(s0 >= s - 0.5, taken[s], a)
                    if s >= 2:
                        bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
                colval = a + 0.5 * (bb - a)
                cv0 = jnp.where(i0 == (base + dd)[None, :], colval, cv0)
                cv1 = jnp.where((i0 + 1) == (base + dd)[None, :], colval, cv1)
            out = cv0 + 0.3 * (cv1 - cv0)
        return out
    return f

ph = slope("horiz chain d=15 S=4 (128,1024)", chain_horiz, mh, i0, idx_lane, *fields4)
print(f"  -> x8 tiles x7 pieces = {ph*56*1e3:.2f} ms", flush=True)

# static-roll variants: all takes replaced by static slices
bigtile = jnp.asarray(rng.random((OUT_H + 32, 128), dtype=np.float32))

def chain_vert_static(K, d=15, S=4):
    @jax.jit
    def f(x, m_t):
        out = jnp.zeros((OUT_H, 128), jnp.float32)
        for k in range(K):
            accs = [jnp.zeros((OUT_H, 128), jnp.float32) for _ in range(S)]
            xx = x * (1 + out[0, 0] * 0)
            for dd in range(d):
                taken = xx[dd : dd + OUT_H, :]
                rid = (idx_rows + dd).astype(jnp.float32)[:, None]
                for s in range(S):
                    accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
            out = accs[0]
            for s in range(1, S):
                out = out + accs[s]
        return out
    return f

pvs = slope("vert STATIC d=15 S=4", chain_vert_static, bigtile, m_t)
print(f"  -> x6 tiles x7 pieces = {pvs*42*1e3:.2f} ms", flush=True)

fieldsw = [jnp.asarray(rng.random((128, OUT_W + 64), dtype=np.float32)) for _ in range(4)]
mhw = jnp.asarray(rng.random((128, OUT_W + 64), dtype=np.float32))
i0s = jnp.asarray(rng.integers(0, 15, (128, OUT_W)).astype(np.int32))

def chain_horiz_static(K, d=15, S=4):
    @jax.jit
    def f(mh, i0, *fields):
        out = jnp.zeros((128, OUT_W), jnp.float32)
        y0w = i0.astype(jnp.float32) * 0.001
        for k in range(K):
            dd0 = (out[0, 0] * 0).astype(jnp.int32)
            cv0 = jnp.zeros((128, OUT_W), jnp.float32)
            cv1 = cv0
            for dd in range(d):
                mg = jax.lax.dynamic_slice(mh, (0, dd0 + dd), (128, OUT_W))
                s0 = jnp.clip(y0w - mg, 0, S - 2)
                taken = [
                    jax.lax.dynamic_slice(f_, (0, dd0 + dd), (128, OUT_W))
                    for f_ in fields
                ]
                a = taken[0]
                bb = taken[1]
                for s in range(1, S):
                    a = jnp.where(s0 >= s - 0.5, taken[s], a)
                    if s >= 2:
                        bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
                colval = a + 0.5 * (bb - a)
                cv0 = jnp.where(i0 == dd, colval, cv0)
                cv1 = jnp.where(i0 + 1 == dd, colval, cv1)
            out = cv0 + 0.3 * (cv1 - cv0)
        return out
    return f

phs = slope("horiz STATIC d=15 S=4", chain_horiz_static, mhw, i0s, *fieldsw)
print(f"  -> x8 tiles x7 pieces = {phs*56*1e3:.2f} ms", flush=True)
