"""Measure coordinate-upload staging strategies for rectify Phase A.

Round-5 probe (VERDICT #5): streaming Phase A is ~0.64 s, dominated by
the 18 MB coordinate upload.  Candidate wins:
  a) is jnp.asarray/device_put async on this backend (do transfers
     pipeline host work)?
  b) do two concurrent transfers share or add tunnel bandwidth?
  c) chunked device_put + jitted reassembly: does overlapping the host
     normalize with in-flight bands beat the serial pattern?
"""
import os
import sys
import time
import threading

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

H, W = 1890, 1189  # OLCI swath
rng = np.random.default_rng(0)
sx = rng.random((H, W)) * 1000.0
sy = rng.random((H, W)) * 1000.0


def sync(d):
    return float(jnp.asarray(d).ravel()[0])


def norm(a, out):
    out[...] = (a - 3.25) / 1.5
    return out


f32x = np.empty((H, W), np.float32)
f32y = np.empty((H, W), np.float32)

# warm pages + one transfer
norm(sx, f32x); norm(sy, f32y)
d = jnp.asarray(f32x); sync(d)

def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms", flush=True)
    return best


# 0) host normalize alone
t("normalize f64->f32 9MB", lambda: norm(sx, f32x))

# 1) single 9 MB upload, synced
t("upload 9MB sync", lambda: sync(jnp.asarray(f32x)))

# 2) asarray async? put both, sync once at the end
def both_then_sync():
    a = jnp.asarray(f32x)
    b = jnp.asarray(f32y)
    sync(a); sync(b)
t("upload 2x9MB serial-put, sync end", both_then_sync)

# 2b) measure how long the puts themselves take (are they blocking?)
def put_only():
    t0 = time.perf_counter()
    a = jnp.asarray(f32x)
    dt_put = time.perf_counter() - t0
    sync(a)
    print(f"   (put call alone: {dt_put*1e3:.0f} ms)", flush=True)
put_only()

# 3) two threads uploading concurrently
def threaded():
    res = [None, None]
    def up(i, buf):
        res[i] = jax.device_put(buf)
    th = [threading.Thread(target=up, args=(i, b)) for i, b in ((0, f32x), (1, f32y))]
    [x.start() for x in th]; [x.join() for x in th]
    sync(res[0]); sync(res[1])
t("upload 2x9MB two threads", threaded)

# 4) chunked put + jit concat (4 bands per array), normalize interleaved
K = 4
step = (H + K - 1) // K
cat = jax.jit(lambda *bs: jnp.concatenate(bs, axis=0))
bandsx = [np.empty((min(step, H - i * step), W), np.float32) for i in range(K)]
bandsy = [np.empty((min(step, H - i * step), W), np.float32) for i in range(K)]

def chunked():
    devx = []
    for i in range(K):
        r0 = i * step
        norm(sx[r0:r0 + bandsx[i].shape[0]], bandsx[i])
        devx.append(jax.device_put(bandsx[i]))
    devy = []
    for i in range(K):
        r0 = i * step
        norm(sy[r0:r0 + bandsy[i].shape[0]], bandsy[i])
        devy.append(jax.device_put(bandsy[i]))
    gx = cat(*devx)
    gy = cat(*devy)
    sync(gx); sync(gy)
t("chunked 4-band put + concat, normalize interleaved", chunked)

# 5) the current production pattern: norm x, put x, norm y, put y, sync
def current():
    norm(sx, f32x)
    a = jnp.asarray(f32x)
    norm(sy, f32y)
    b = jnp.asarray(f32y)
    sync(a); sync(b)
t("current pattern norm/put interleaved", current)
