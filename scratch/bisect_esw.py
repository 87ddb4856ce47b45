import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import plan_esw, _offset_fields
from xcube_resampling_tpu.ops.srw import _coarse_geometry, _source_window_gm
from xcube_resampling_tpu.ops.reproject_ops import _interp_field

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
tgt = GridMapping.regular(size=(4096, 2048), xy_min=(900000.0, 900000.0), xy_res=875.0, crs="epsg:3035")
fields = _coarse_geometry(source_gm, tgt, 16)
_, win = _source_window_gm(source_gm, fields, margin=56)
fp = _offset_fields(fields, *win)
p = plan_esw(source_gm, tgt, fields=fp, fields_global=fields, win=win)
S = p.n_samples; half = (S - 2) / 2.0
print(f"S {S} d_v {p.d_v}(ct {p.col_tile}, nct {p.base_v.shape[1]}) d_h {p.d_h}(rt {p.row_tile}, nrt {p.base_h.shape[0]}) bits {p.bits_v}/{p.bits_h} srcwin {p.src_h}x{p.src_w} out {p.out_h}x{p.out_w}", flush=True)

bv = jnp.asarray(p.base_v); bh = jnp.asarray(p.base_h)
sv = jnp.asarray(p.s_v) if p.s_v is not None else None
sh = jnp.asarray(p.s_h) if p.s_h is not None else None
r_lo = min(0, int(p.base_v.min())); r_hi = max(0, int(p.base_v.max()) + p.d_v - p.src_h)
ext_h = p.src_h - r_lo + r_hi
c_lo = min(0, int(p.base_h.min())); c_hi = max(0, int(p.base_h.max()) + p.d_h - p.src_w)
ext_w = p.src_w - c_lo + c_hi
n_ct = p.base_v.shape[1]; n_rt = p.base_h.shape[0]

@jax.jit
def precompute(iystar_f, ix_f, iy_f):
    rows = jnp.arange(p.out_h, dtype=jnp.float32)[:, None]
    cols_src = jnp.arange(p.src_w, dtype=jnp.float32)[None, :]
    pos_v = _interp_field(iystar_f, rows, cols_src, p.step, jnp)
    m = jnp.floor(pos_v - half)
    m_v = m - sv[None, :].astype(jnp.float32) if sv is not None else m
    if sh is not None:
        cidx = jnp.clip(jnp.arange(ext_w, dtype=jnp.int32)[None, :] + c_lo + sh[:, None], 0, p.src_w - 1)
        m_h = jnp.take_along_axis(m, cidx, axis=1)
    else:
        m_h = m
    cols = jnp.arange(p.out_w, dtype=jnp.float32)[None, :]
    ix_full = _interp_field(ix_f, rows, cols, p.step, jnp)
    iy_full = _interp_field(iy_f, rows, cols, p.step, jnp)
    valid = (ix_full > -0.5) & (ix_full < p.src_w_g - 0.5) & (iy_full > -0.5) & (iy_full < p.src_h_g - 0.5)
    return m_v, m_h, jnp.clip(ix_full, 0, p.src_w_g - 1), jnp.clip(iy_full, 0, p.src_h_g - 1), valid

m_v, m_h, ixc, iyc, valid = precompute(jnp.asarray(p.iystar_c), jnp.asarray(p.ix_c), jnp.asarray(p.iy_c))

@jax.jit
def stage_roll_v(src):
    src2 = src.astype(jnp.float32)
    if sv is not None:
        if r_lo or r_hi:
            parts = [src2]
            if r_lo: parts.insert(0, jnp.repeat(src2[..., :1, :], -r_lo, axis=-2))
            if r_hi: parts.append(jnp.repeat(src2[..., -1:, :], r_hi, axis=-2))
            src2 = jnp.concatenate(parts, axis=-2)
        for b in range(p.bits_v):
            k = 1 << b
            rolled = jnp.concatenate([src2[..., k:, :], jnp.repeat(src2[..., -1:, :], k, axis=-2)], axis=-2)
            src2 = jnp.where(((sv >> b) & 1).astype(bool)[None, :], rolled, src2)
    return src2

@jax.jit
def stage_vert(src2):
    v_tiles = [[] for _ in range(S)]
    for t in range(n_ct):
        c0 = t * p.col_tile; c1 = min((t + 1) * p.col_tile, p.src_w)
        tile_src = src2[..., c0:c1]
        m_t = m_v[:, c0:c1]; base_t = bv[:, t]
        accs = [jnp.zeros((p.out_h, c1 - c0), jnp.float32) for _ in range(S)]
        for d in range(p.d_v):
            idx = jnp.clip(base_t + d - r_lo, 0, ext_h - 1)
            taken = jnp.take(tile_src, idx, axis=-2)
            rid = (base_t + d).astype(jnp.float32)[:, None]
            for s in range(S):
                accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
        for s in range(S): v_tiles[s].append(accs[s])
    return [jnp.concatenate(v_tiles[s], axis=-1) for s in range(S)]

@jax.jit
def stage_roll_h(fields):
    if sh is None: return fields
    masks = [((sh >> b) & 1).astype(bool)[:, None] for b in range(p.bits_h)]
    outf = []
    for f in fields:
        if c_lo or c_hi:
            parts = [f]
            if c_lo: parts.insert(0, jnp.repeat(f[..., :, :1], -c_lo, axis=-1))
            if c_hi: parts.append(jnp.repeat(f[..., :, -1:], c_hi, axis=-1))
            f = jnp.concatenate(parts, axis=-1)
        for b in range(p.bits_h):
            k = 1 << b
            rolled = jnp.concatenate([f[..., :, k:], jnp.repeat(f[..., :, -1:], k, axis=-1)], axis=-1)
            f = jnp.where(masks[b], rolled, f)
        outf.append(f)
    return outf

@jax.jit
def stage_horiz(fields):
    out_tiles = []
    for t in range(n_rt):
        r0 = t * p.row_tile; r1 = min((t + 1) * p.row_tile, p.out_h)
        base_t = bh[t]
        ixc_t = ixc[r0:r1, :]; iyc_t = iyc[r0:r1, :]
        m_rows = m_h[r0:r1, :]
        f_rows = [f[..., r0:r1, :] for f in fields]
        y0f = jnp.floor(iyc_t); fy = iyc_t - y0f
        x0 = jnp.floor(ixc_t); fx = ixc_t - x0
        i0 = x0.astype(jnp.int32) - p.i_off
        if sh is not None: i0 = i0 - sh[r0:r1][:, None]
        y0w = y0f - p.j_off
        cv0 = jnp.zeros((r1 - r0, p.out_w), jnp.float32); cv1 = cv0
        for d in range(p.d_h):
            idx = jnp.clip(base_t + d - c_lo, 0, ext_w - 1)
            mg = jnp.take(m_rows, idx, axis=-1)
            s0 = jnp.clip(y0w - mg, 0, S - 2)
            taken = [jnp.take(f, idx, axis=-1) for f in f_rows]
            a = taken[0]; bb = taken[1]
            for s in range(1, S):
                a = jnp.where(s0 >= s - 0.5, taken[s], a)
                if s >= 2: bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
            colval = a + fy * (bb - a)
            cv0 = jnp.where(i0 == base_t + d, colval, cv0)
            cv1 = jnp.where(i0 + 1 == base_t + d, colval, cv1)
        out_tiles.append(cv0 + fx * (cv1 - cv0))
    out = jnp.concatenate(out_tiles, axis=-2)
    return jnp.where(valid, out, jnp.float32(np.nan))

def timeit(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.time(); r = f(*a); jax.block_until_ready(r); ts.append(time.time()-t0)
    return min(ts), r

src = jnp.asarray(np.random.default_rng(0).random((3600, 7200), dtype=np.float32))
srcw = src[win[0]:win[1], win[2]:win[3]]
t1, src2 = timeit(stage_roll_v, srcw)
t2, fields_v = timeit(stage_vert, src2)
t3, fields_h = timeit(stage_roll_h, fields_v)
t4, out = timeit(stage_horiz, fields_h)
print(f"roll_v {t1*1e3:.2f}ms vert {t2*1e3:.2f}ms roll_h {t3*1e3:.2f}ms horiz {t4*1e3:.2f}ms total {sum((t1,t2,t3,t4))*1e3:.2f}ms", flush=True)
print("finite", float(jnp.isfinite(out).mean()), flush=True)
