"""TPU check for the dense one-hot-matmul piece kernel: exactness vs the
gather piece kernel on the MXU (the CPU pass can emulate bf16 dots in
f32; this is the real hardware test), plus per-piece timing for both.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import _time_fn
from xcube_resampling_tpu.ops.reproject_ops import (
    make_gather_piece_kernel_dyn,
)
from scratch.dense_select_proto import make_dense_piece_kernel

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(7)
step = 16
src_h_g, src_w_g = 3600, 7200

for (out_h, out_w, wh, ww) in [
    (128, 128, 176, 272),
    (256, 256, 224, 544),
    (512, 512, 320, 688),
]:
    ncj = out_h // step + 2
    nci = out_w // step + 2
    iy_f = (20 + (wh - 60) * rng.random((ncj, nci))).astype(np.float32)
    ix_f = (20 + (ww - 60) * rng.random((ncj, nci))).astype(np.float32)
    ix_f[0, 0] = -50.0
    iy_f[-1, -1] = -40.0

    src_win = rng.random((wh, ww), dtype=np.float32) * 2e8 - 1e8
    flat = src_win.ravel()
    idx = rng.integers(0, wh * ww, 500)
    flat[idx[:200]] = np.nan
    flat[idx[200:350]] = np.inf
    flat[idx[350:]] = -np.inf
    flat[5] = 1e-41

    sw = jnp.asarray(src_win)
    ixj = jnp.asarray(ix_f)
    iyj = jnp.asarray(iy_f)

    for method in ("nearest", "bilinear"):
        gk = jax.jit(make_gather_piece_kernel_dyn(
            step, out_h, out_w, src_h_g, src_w_g, method, np.nan
        ), static_argnums=(3, 4))
        dk = jax.jit(make_dense_piece_kernel(
            step, out_h, out_w, src_h_g, src_w_g, method, np.nan
        ), static_argnums=(3, 4))
        a = np.asarray(gk(sw, ixj, iyj, 0, 0))
        b = np.asarray(dk(sw, ixj, iyj, 0, 0))
        ok = np.array_equal(a, b, equal_nan=True)
        n_diff = int((~((a == b) | (np.isnan(a) & np.isnan(b)))).sum())
        tg = _time_fn(lambda s: gk(s, ixj, iyj, 0, 0), sw, iters=20)
        td = _time_fn(lambda s: dk(s, ixj, iyj, 0, 0), sw, iters=20)
        print(
            f"{out_h}x{out_w} win {wh}x{ww} {method:9s}: "
            f"exact={ok} n_diff={n_diff}  "
            f"gather {tg*1e3:7.3f} ms  dense {td*1e3:7.3f} ms  "
            f"speedup {tg/td:5.1f}x",
            flush=True,
        )
