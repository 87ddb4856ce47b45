"""Is the mosaic group vmap the hidden cost? Compare the ESW chains
vmapped over B=7 pieces vs an unrolled per-piece loop, dispatch-amortized
(K repeats inside one jit, slope of K=4 vs K=1).
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

rng = np.random.default_rng(0)
B = 7
OUT_H, OUT_W = 1024, 1024
SRC_H, SRC_W = 496, 672
EXT_W = SRC_W + 64
D, S = 15, 4

probe = jax.jit(lambda acc, x: acc + x.ravel()[0])

def slope(name, make_chain, *args, iters=6, scale=1.0):
    res = {}
    for K in (1, 4):
        f = make_chain(K)
        acc = jnp.float32(0)
        acc = probe(acc, f(*args)); float(acc)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            a0 = acc
            for _ in range(iters):
                a0 = probe(a0, f(*args))
            float(a0)
            times.append((time.perf_counter() - t0) / iters)
        res[K] = min(times)
    per_op = (res[4] - res[1]) / 3
    print(f"{name:46s} {per_op*1e3:8.2f} ms/op (x{scale:g} = {per_op*scale*1e3:.2f} ms)", flush=True)
    return per_op

# ---- horizontal pass over ALL 8 row tiles, one piece --------------------
mh = jnp.asarray(rng.random((OUT_H, EXT_W), dtype=np.float32))
i0 = jnp.asarray(
    (np.sort(rng.integers(0, SRC_W - 1, OUT_W))[None, :]
     + rng.integers(0, D, (OUT_H, OUT_W))).astype(np.int32))
idx_lane_np = np.sort(rng.integers(0, SRC_W - 1, OUT_W)).astype(np.int32)
idx_lane = jnp.asarray(idx_lane_np)
fields1 = jnp.asarray(rng.random((S, OUT_H, EXT_W), dtype=np.float32))

def horiz_piece(fields, mh, i0, base):
    out_tiles = []
    for t in range(OUT_H // 128):
        r0, r1 = t * 128, (t + 1) * 128
        mt = mh[r0:r1]
        i0t = i0[r0:r1]
        ft = [fields[s, r0:r1] for s in range(S)]
        y0w = i0t.astype(jnp.float32) * 0.001
        cv0 = jnp.zeros((128, OUT_W), jnp.float32)
        cv1 = cv0
        for dd in range(D):
            i2 = jnp.clip(base + dd, 0, EXT_W - 1)
            mg = jnp.take(mt, i2, axis=-1)
            s0 = jnp.clip(y0w - mg, 0, S - 2)
            taken = [jnp.take(f_, i2, axis=-1) for f_ in ft]
            a, bb = taken[0], taken[1]
            for s in range(1, S):
                a = jnp.where(s0 >= s - 0.5, taken[s], a)
                if s >= 2:
                    bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
            colval = a + 0.5 * (bb - a)
            cv0 = jnp.where(i0t == (base + dd)[None, :], colval, cv0)
            cv1 = jnp.where((i0t + 1) == (base + dd)[None, :], colval, cv1)
        out_tiles.append(cv0 + 0.3 * (cv1 - cv0))
    return jnp.concatenate(out_tiles, axis=0)

def make_h1(K):
    @jax.jit
    def f(fields, mh, i0):
        out = jnp.zeros((OUT_H, OUT_W), jnp.float32)
        for k in range(K):
            base = idx_lane + (out[0, 0] * 0).astype(jnp.int32)
            out = horiz_piece(fields, mh, i0, base)
        return out
    return f

p1 = slope("horiz 1 piece (8 tiles)", make_h1, fields1, mh, i0, scale=7)

# ---- vmapped over B pieces ----------------------------------------------
fieldsB = jnp.asarray(rng.random((B, S, OUT_H, EXT_W), dtype=np.float32))
mhB = jnp.asarray(rng.random((B, OUT_H, EXT_W), dtype=np.float32))
i0B = jnp.asarray(
    (np.sort(rng.integers(0, SRC_W - 1, OUT_W))[None, None, :]
     + rng.integers(0, D, (B, OUT_H, OUT_W))).astype(np.int32))
baseB_np = np.stack([np.sort(rng.integers(0, SRC_W - 1, OUT_W)) for _ in range(B)]).astype(np.int32)
baseB = jnp.asarray(baseB_np)

def make_hv(K):
    @jax.jit
    def f(fields, mh, i0, baseB):
        out = jnp.zeros((B, OUT_H, OUT_W), jnp.float32)
        for k in range(K):
            b2 = baseB + (out[0, 0, 0] * 0).astype(jnp.int32)
            out = jax.vmap(horiz_piece)(fields, mh, i0, b2)
        return out
    return f

slope("horiz vmap B=7", make_hv, fieldsB, mhB, i0B, baseB, scale=1)

def make_hseq(K):
    @jax.jit
    def f(fields, mh, i0, baseB):
        out = jnp.zeros((B, OUT_H, OUT_W), jnp.float32)
        for k in range(K):
            outs = []
            for b in range(B):
                b2 = baseB[b] + (out[0, 0, 0] * 0).astype(jnp.int32)
                outs.append(horiz_piece(fields[b], mh[b], i0[b], b2))
            out = jnp.stack(outs)
        return out
    return f

slope("horiz unrolled loop B=7", make_hseq, fieldsB, mhB, i0B, baseB, scale=1)

# ---- vertical pass, one piece vs vmapped --------------------------------
srcB = jnp.asarray(rng.random((B, SRC_H + 32, SRC_W), dtype=np.float32))
idx_rows_np = np.sort(rng.integers(0, SRC_H - 1, OUT_H)).astype(np.int32)
bvB = jnp.asarray(np.stack([idx_rows_np for _ in range(B)]))
m_tB = jnp.asarray(
    (idx_rows_np[:, None] + rng.integers(0, D, (B, OUT_H, SRC_W))).astype(np.float32))

def vert_piece(src2, m_v, bv):
    n_tiles = SRC_W // 128 + (1 if SRC_W % 128 else 0)
    v_fields = [[] for _ in range(S)]
    for t in range(n_tiles):
        c0 = t * 128
        c1 = min((t + 1) * 128, SRC_W)
        tile_src = src2[:, c0:c1]
        m_t = m_v[:, c0:c1]
        accs = [jnp.zeros((OUT_H, c1 - c0), jnp.float32) for _ in range(S)]
        for dd in range(D):
            i2 = jnp.clip(bv + dd, 0, SRC_H + 31)
            taken = jnp.take(tile_src, i2, axis=0)
            rid = (bv + dd).astype(jnp.float32)[:, None]
            for s in range(S):
                accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
        for s in range(S):
            v_fields[s].append(accs[s])
    return jnp.stack([jnp.concatenate(v_fields[s], axis=-1) for s in range(S)])

def make_v1(K):
    @jax.jit
    def f(src2, m_v):
        out = jnp.zeros((S, OUT_H, SRC_W), jnp.float32)
        for k in range(K):
            bv = jnp.asarray(idx_rows_np) + (out[0, 0, 0] * 0).astype(jnp.int32)
            out = vert_piece(src2, m_v, bv)
        return out
    return f

slope("vert 1 piece (6 tiles)", make_v1, srcB[0], m_tB[0], scale=7)

def make_vv(K):
    @jax.jit
    def f(srcB, m_vB, bvB):
        out = jnp.zeros((B, S, OUT_H, SRC_W), jnp.float32)
        for k in range(K):
            b2 = bvB + (out[0, 0, 0, 0] * 0).astype(jnp.int32)
            out = jax.vmap(vert_piece)(srcB, m_vB, b2)
        return out
    return f

slope("vert vmap B=7", make_vv, srcB, m_tB, bvB, scale=1)

def make_vseq(K):
    @jax.jit
    def f(srcB, m_vB, bvB):
        out = jnp.zeros((B, S, OUT_H, SRC_W), jnp.float32)
        for k in range(K):
            outs = []
            for b in range(B):
                b2 = bvB[b] + (out[0, 0, 0, 0] * 0).astype(jnp.int32)
                outs.append(vert_piece(srcB[b], m_vB[b], b2))
            out = jnp.stack(outs)
        return out
    return f

slope("vert unrolled loop B=7", make_vseq, srcB, m_tB, bvB, scale=1)
