"""Pallas VMEM-resident select chains for the static-cover ESW formulation.

The XLA kernel is stream-bound: every tap select re-streams (out_h, src_w)
arrays through HBM (~285 passes/pixel-stream on the bucket-28 group).  Two
Pallas kernels keep the chains in VMEM — vertical (JV x S selects over the
cover-resampled rows) and horizontal (JH taps of sample-blend + column
match) — with the cheap one-pass gathers (row cover, column cover) left to
XLA between them.  A/B against the XLA static formulation from
scratch/esw_static_proto.py on identical inputs.
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
B = int(os.environ.get("PROBE_B", "3"))
OUT_H, OUT_W = int(os.environ.get("PROBE_OH", "512")), 1024
SRC_H, SRC_W = 496, 672
D, S = 15, 4
DV = 15
RT = 128  # row band
print(f"B={B} OUT={OUT_H}x{OUT_W}", flush=True)

probe = jax.jit(lambda acc, x: acc + x.ravel()[0])

def timegroup(name, f, *args, iters=5):
    t0 = time.perf_counter()
    y = f(*args)
    print(f"{name}: compiled in {time.perf_counter()-t0:.1f} s", flush=True)
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
    dt = min(times)
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt

# ---- identical synthetic geometry to esw_static_proto -------------------
slope_v = 0.45
bv_np = np.clip((np.arange(OUT_H) * slope_v).astype(np.int32), 0, SRC_H - DV - 1)
m_v_np = bv_np[:, None] + rng.integers(0, DV - S, (OUT_H, SRC_W))
slope_h = 0.62
bh_np = np.clip((np.arange(OUT_W) * slope_h).astype(np.int32), 0, SRC_W - D - 1)
i0_np = bh_np[None, :] + rng.integers(0, D - 1, (OUT_H, OUT_W))

src_np = rng.random((B, SRC_H, SRC_W), dtype=np.float32)
mv_f_np = np.broadcast_to(m_v_np.astype(np.float32), (B, OUT_H, SRC_W)).copy()
i0B_np = np.broadcast_to(i0_np, (B, OUT_H, OUT_W)).copy()
mh_np = rng.random((B, OUT_H, SRC_W), dtype=np.float32)
fy_np = rng.random((B, OUT_H, OUT_W), dtype=np.float32)

src = jnp.asarray(src_np)
mvf = jnp.asarray(mv_f_np)
i0B = jnp.asarray(i0B_np)
mhB = jnp.asarray(mh_np)
fyB = jnp.asarray(fy_np)
bv = jnp.asarray(bv_np)
bh = jnp.asarray(bh_np)
float(fyB.ravel()[0])

JV = int(np.ceil(DV / slope_v)) + 2
bv_pad_np = np.concatenate([bv_np, np.full(JV, bv_np[-1], np.int32)])
bv_pad = jnp.asarray(bv_pad_np)
JH = int(np.ceil(D / slope_h)) + 2
bh_pad_np = np.concatenate(
    [bh_np, np.clip(bh_np[-1] + 1 + np.arange(JH), 0, SRC_W - 1).astype(np.int32)]
)
bh_pad = jnp.asarray(bh_pad_np)
Q_np = np.stack([bh_pad_np[j : j + OUT_W] - bh_pad_np[:OUT_W] for j in range(JH)])
Q = jnp.asarray(Q_np.astype(np.float32))

N_RT = OUT_H // RT
# lane-padded widths (last dim multiples of 128)
SRC_WP = -(-SRC_W // 128) * 128
AW = -(-(OUT_W + JH) // 128) * 128

# ======== XLA reference (static formulation, from esw_static_proto) ======
def vert_new(src2, m_v):
    v_fields = [[] for _ in range(S)]
    N_CT = -(-SRC_W // 128)
    for t in range(N_CT):
        c0, c1 = t * 128, min((t + 1) * 128, SRC_W)
        tile_src = src2[:, c0:c1]
        m_t = m_v[:, c0:c1]
        idx = jnp.clip(bv_pad[: OUT_H + JV], 0, SRC_H - 1)
        R = jnp.take(tile_src, idx, axis=0)
        accs = [jnp.zeros((OUT_H, c1 - c0), jnp.float32) for _ in range(S)]
        for j in range(JV):
            taken = R[j : j + OUT_H, :]
            rid = bv_pad[j : j + OUT_H].astype(jnp.float32)[:, None]
            for s in range(S):
                accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
        for s in range(S):
            v_fields[s].append(accs[s])
    return [jnp.concatenate(v_fields[s], axis=-1) for s in range(S)]

def horiz_new(fields, mh, i0, fy):
    out_tiles = []
    for t in range(N_RT):
        r0, r1 = t * RT, (t + 1) * RT
        i0t = i0[r0:r1]
        fyt = fy[r0:r1]
        mt = mh[r0:r1]
        idx = jnp.clip(bh_pad, 0, SRC_W - 1)
        A = [jnp.take(f[r0:r1], idx, axis=-1) for f in fields]
        Am = jnp.take(mt, idx, axis=-1)
        delta = i0t - bh[None, :]
        y0w = fyt * (S - 2)
        cv0 = jnp.zeros((RT, OUT_W), jnp.float32)
        cv1 = cv0
        for j in range(JH):
            mg = Am[:, j : j + OUT_W]
            s0 = jnp.clip(y0w - mg + 1.0, 0, S - 2)
            taken = [a_[:, j : j + OUT_W] for a_ in A]
            a, bb = taken[0], taken[1]
            for s in range(1, S):
                a = jnp.where(s0 >= s - 0.5, taken[s], a)
                if s >= 2:
                    bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
            colval = a + fyt * (bb - a)
            qj = Q[j][None, :]
            cv0 = jnp.where(delta == qj, colval, cv0)
            cv1 = jnp.where(delta + 1 == qj, colval, cv1)
        out_tiles.append(cv0 + fyt * (cv1 - cv0))
    return jnp.concatenate(out_tiles, axis=0)

def piece_xla(src2, m_v, mh, i0, fy):
    return horiz_new(vert_new(src2, m_v), mh, i0, fy)

@jax.jit
def group_xla(src, mvf, mhB, i0B, fyB):
    return jnp.stack([
        piece_xla(src[b], mvf[b], mhB[b], i0B[b], fyB[b]) for b in range(B)
    ])

# ======== Pallas kernels ==================================================
# Vertical: grid over row bands; R rows for band t live in an overlapped
# band tensor (N_RT, RT+JV, SRC_WP) precomputed by XLA (one cheap gather).
def _vert_kernel(r_ref, rid_ref, m_ref, *o_refs):
    m = m_ref[0]
    accs = [jnp.zeros((RT, SRC_WP), jnp.float32) for _ in range(S)]
    for j in range(JV):
        taken = r_ref[0, j : j + RT, :]
        rid = rid_ref[0, j : j + RT, :]  # (RT, 1) f32
        for s in range(S):
            accs[s] = jnp.where(m == rid - s, taken, accs[s])
    for s in range(S):
        o_refs[s][0] = accs[s]


def _pallas_vert(r_bands, rid_bands, m_v):
    # r_bands (N_RT, RT+JV, SRC_WP), rid_bands (N_RT, RT+JV, 1), m_v (N_RT, RT, SRC_WP)
    grid = (N_RT,)
    out = pl.pallas_call(
        _vert_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, RT + JV, SRC_WP), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT + JV, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, SRC_WP), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT, SRC_WP), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(S)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_RT, RT, SRC_WP), jnp.float32) for _ in range(S)
        ],
    )(r_bands, rid_bands, m_v)
    return out


def _horiz_kernel(am_ref, a_refs_and_rest):
    pass  # placeholder, real body below


CW = 128  # output column chunk inside the kernel: bounds temporary liveness


def _horiz_body(am_ref, *rest):
    # rest = S field refs, delta, fy, q, out
    a_refs = rest[:S]
    delta_ref, fy_ref, q_ref, o_ref = rest[S:]
    for c0 in range(0, OUT_W, CW):
        fy = fy_ref[0, :, c0 : c0 + CW]
        delta = delta_ref[0, :, c0 : c0 + CW]
        y0w = fy * (S - 2)
        cv0 = jnp.zeros((RT, CW), jnp.float32)
        cv1 = cv0
        for j in range(JH):
            mg = am_ref[0, :, c0 + j : c0 + j + CW]
            s0 = jnp.clip(y0w - mg + 1.0, 0, S - 2)
            a = a_refs[0][0, :, c0 + j : c0 + j + CW]
            bb = a_refs[1][0, :, c0 + j : c0 + j + CW]
            for s in range(1, S):
                ts_ = a_refs[s][0, :, c0 + j : c0 + j + CW]
                a = jnp.where(s0 >= s - 0.5, ts_, a)
                if s >= 2:
                    bb = jnp.where(s0 >= s - 1.5, ts_, bb)
            colval = a + fy * (bb - a)
            qj = q_ref[j : j + 1, c0 : c0 + CW]
            cv0 = jnp.where(delta == qj, colval, cv0)
            cv1 = jnp.where(delta + 1 == qj, colval, cv1)
        o_ref[0, :, c0 : c0 + CW] = cv0 + fy * (cv1 - cv0)


def _pallas_horiz(Am, A, delta, fy, q):
    # Am (N_RT, RT, AW); A: S x (N_RT, RT, AW); delta/fy (N_RT, RT, OUT_W); q (JH, OUT_W)
    grid = (N_RT,)
    band3 = lambda w: pl.BlockSpec((1, RT, w), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _horiz_body,
        grid=grid,
        in_specs=[band3(AW)]
        + [band3(AW) for _ in range(S)]
        + [band3(OUT_W), band3(OUT_W),
           pl.BlockSpec((JH, OUT_W), lambda t: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=band3(OUT_W),
        out_shape=jax.ShapeDtypeStruct((N_RT, RT, OUT_W), jnp.float32),
    )(Am, *A, delta, fy, q)
    return out


def piece_pallas(src2, m_v, mh, i0, fy):
    # XLA prep: one row gather -> overlapped bands, pad lanes
    idx = jnp.clip(bv_pad[: OUT_H + JV], 0, SRC_H - 1)
    R = jnp.take(src2, idx, axis=0)  # (OUT_H+JV, SRC_W)
    R = jnp.pad(R, ((0, 0), (0, SRC_WP - SRC_W)))
    r_bands = jnp.stack([R[t * RT : t * RT + RT + JV] for t in range(N_RT)])
    rid = bv_pad[: OUT_H + JV].astype(jnp.float32)[:, None]
    rid_bands = jnp.stack([rid[t * RT : t * RT + RT + JV] for t in range(N_RT)])
    m_vp = jnp.pad(m_v, ((0, 0), (0, SRC_WP - SRC_W))).reshape(N_RT, RT, SRC_WP)

    fields = _pallas_vert(r_bands, rid_bands, m_vp)  # S x (N_RT, RT, SRC_WP)

    # XLA prep: column gathers through the cover (one take per field)
    idx_h = jnp.clip(bh_pad, 0, SRC_W - 1)
    A = [
        jnp.pad(jnp.take(f.reshape(OUT_H, SRC_WP), idx_h, axis=-1),
                ((0, 0), (0, AW - OUT_W - JH))).reshape(N_RT, RT, AW)
        for f in fields
    ]
    Am = jnp.pad(jnp.take(mh, idx_h, axis=-1),
                 ((0, 0), (0, AW - OUT_W - JH))).reshape(N_RT, RT, AW)
    delta = (i0 - bh[None, :]).astype(jnp.float32).reshape(N_RT, RT, OUT_W)
    fyb = fy.reshape(N_RT, RT, OUT_W)
    out = _pallas_horiz(Am, A, delta, fyb, Q)
    return out.reshape(OUT_H, OUT_W)


@jax.jit
def group_pallas(src, mvf, mhB, i0B, fyB):
    return jnp.stack([
        piece_pallas(src[b], mvf[b], mhB[b], i0B[b], fyB[b]) for b in range(B)
    ])


# ---- correctness vs XLA --------------------------------------------------
ref = np.asarray(group_xla(src, mvf, mhB, i0B, fyB))
got = np.asarray(group_pallas(src, mvf, mhB, i0B, fyB))
diff = np.abs(ref - got)
print(f"max |pallas - xla| = {diff.max():.3e}  (mismatches: {(diff > 0).sum()})",
      flush=True)

timegroup("XLA static, unrolled", group_xla, src, mvf, mhB, i0B, fyB)
timegroup("Pallas chains, unrolled", group_pallas, src, mvf, mhB, i0B, fyB)
