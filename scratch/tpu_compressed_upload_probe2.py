"""Block-broadcast host compression for the f16-residual upload.

probe1 showed: transfer halves (233 -> 133 ms/array) and accuracy matches
plain f32, but the gather-based host compress cost 266 ms.  Here the
interior prediction is computed per 16x16 block from the coarse corners
with broadcast weights (no full-image gathers); ragged edge strips go
through the small generic path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

print(jax.devices(), flush=True)

H, W, STEP = 1890, 1189, 16

j = np.arange(H, dtype=np.float64)[:, None]
i = np.arange(W, dtype=np.float64)[None, :]
gx = (i + 0.12 * j + 2e-5 * j * i) * 1.02 + 7.3
gx32 = gx.astype(np.float32)

# node index lines: 0, 16, ..., plus the exact last index
def _nodes(n):
    k = np.arange(0, n - 1, STEP, dtype=np.int64)
    return np.append(k, n - 1)

CH, CW = _nodes(H), _nodes(W)
KH, KW = len(CH) - 1, len(CW) - 1  # cell counts
FH, FW = (KH - 1) * STEP, (KW - 1) * STEP  # full-cell interior extent
# interior weights: one 16-vector reused by every full cell
wf = (np.arange(STEP, dtype=np.float32) / STEP)[None, :]  # (1, STEP)


def compress(a):
    a32 = a.astype(np.float32)
    coarse = a32[np.ix_(CH, CW)]
    resid = np.empty((H, W), np.float16)

    # full interior cells: (KH-1, KW-1) blocks of 16x16
    c = coarse[: KH, : KW]
    c00 = c[: KH - 1, : KW - 1]
    c01 = coarse[: KH - 1, 1:KW]
    c10 = coarse[1:KH, : KW - 1]
    c11 = coarse[1:KH, 1:KW]
    wj = wf.reshape(1, STEP, 1, 1)
    wi = wf.reshape(1, 1, 1, STEP)
    top = c00[:, None, :, None] * (1 - wi) + c01[:, None, :, None] * wi
    bot = c10[:, None, :, None] * (1 - wi) + c11[:, None, :, None] * wi
    pred = top * (1 - wj) + bot * wj  # (KH-1, STEP, KW-1, STEP)
    block = a32[:FH, :FW].reshape(KH - 1, STEP, KW - 1, STEP)
    resid[:FH, :FW] = (block - pred).reshape(FH, FW)

    # edge strips (right columns and bottom rows): generic bilinear
    def strip(r0, r1, c0, c1):
        jj = np.arange(r0, r1, dtype=np.float32)
        ii = np.arange(c0, c1, dtype=np.float32)
        rj = np.clip(np.searchsorted(CH, jj, side="right") - 1, 0, KH - 1)
        ri = np.clip(np.searchsorted(CW, ii, side="right") - 1, 0, KW - 1)
        wj = ((jj - CH[rj]) / (CH[rj + 1] - CH[rj])).astype(np.float32)
        wi = ((ii - CW[ri]) / (CW[ri + 1] - CW[ri])).astype(np.float32)
        c00 = coarse[np.ix_(rj, ri)]
        c01 = coarse[np.ix_(rj, ri + 1)]
        c10 = coarse[np.ix_(rj + 1, ri)]
        c11 = coarse[np.ix_(rj + 1, ri + 1)]
        top = c00 + wi[None, :] * (c01 - c00)
        bot = c10 + wi[None, :] * (c11 - c10)
        pred = top + wj[:, None] * (bot - top)
        resid[r0:r1, c0:c1] = a32[r0:r1, c0:c1] - pred

    strip(0, FH, FW, W)
    strip(FH, H, 0, W)
    return coarse, resid


def make_recon():
    jj = np.arange(H, dtype=np.float32)
    ii = np.arange(W, dtype=np.float32)
    rj = np.clip(np.searchsorted(CH, jj, side="right") - 1, 0, KH - 1)
    ri = np.clip(np.searchsorted(CW, ii, side="right") - 1, 0, KW - 1)
    wj = ((jj - CH[rj]) / (CH[rj + 1] - CH[rj])).astype(np.float32)
    wi = ((ii - CW[ri]) / (CW[ri + 1] - CW[ri])).astype(np.float32)
    rj_d, ri_d = jnp.asarray(rj), jnp.asarray(ri)
    wj_d = jnp.asarray(wj[:, None])
    wi_d = jnp.asarray(wi[None, :])

    @jax.jit
    def recon(coarse, resid):
        c00 = coarse[rj_d][:, ri_d]
        c01 = coarse[rj_d][:, ri_d + 1]
        c10 = coarse[rj_d + 1][:, ri_d]
        c11 = coarse[rj_d + 1][:, ri_d + 1]
        # interior formula: c00*(1-wi) + c01*wi etc. (must match host)
        top = c00 * (1 - wi_d) + c01 * wi_d
        bot = c10 * (1 - wi_d) + c11 * wi_d
        pred = top * (1 - wj_d) + bot * wj_d
        return pred + resid.astype(jnp.float32)

    return recon


def sync(d):
    return float(jnp.asarray(d).ravel()[0])


coarse, resid = compress(gx)
print(f"resid range {np.abs(np.float64(resid)).max():.2e}", flush=True)
recon = make_recon()
gx_rec = np.asarray(recon(jnp.asarray(coarse), jnp.asarray(resid)))
err_int = np.abs(gx_rec.astype(np.float64) - gx)[:FH, :FW].max()
err_all = np.abs(gx_rec.astype(np.float64) - gx).max()
err_f32 = np.abs(gx32.astype(np.float64) - gx).max()
print(f"max err: interior {err_int:.2e} all {err_all:.2e} "
      f"plain-f32 {err_f32:.2e}", flush=True)


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms", flush=True)


t("compress (host, block)", lambda: compress(gx))
gx2 = gx * 0.97  # fresh values each time to defeat caching illusions


def comp_upload():
    c, r = compress(gx2)
    sync(recon(jnp.asarray(c), jnp.asarray(r)))


t("compress+upload+recon+sync", comp_upload)
t("plain f32 upload+sync", lambda: sync(jnp.asarray(gx32)))

# the production sequence: two arrays, compress of #2 overlapping the
# async transfer of #1
gy = (j - 0.08 * i + 1.2e-5 * (i - W / 2) ** 2) * 0.98 - 3.1


def pair_compressed():
    cx, rx = compress(gx)
    dx = (jax.device_put(cx), jax.device_put(rx))
    cy, ry = compress(gy)
    dy = (jax.device_put(cy), jax.device_put(ry))
    a = recon(*dx)
    b = recon(*dy)
    sync(a); sync(b)


t("PAIR compressed, interleaved", pair_compressed)

f32y = gy.astype(np.float32)


def pair_plain():
    x32 = gx.astype(np.float32)
    a = jnp.asarray(x32)
    y32 = gy.astype(np.float32)
    b = jnp.asarray(y32)
    sync(a); sync(b)


t("PAIR plain f32, interleaved", pair_plain)
