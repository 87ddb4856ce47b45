"""TPU probe: per-stage cost of the hybrid Phase-A kernel.

Builds truncated variants of the hybrid kernel (seed+walk only; +window
loads; full) and times each on the OLCI geometry, so the optimization
target is measured, not guessed.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")
from tests.sampledata import create_olci_like_swath
from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops import rectify_ops as R

print("devices:", jax.devices(), flush=True)

ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)
gm = GridMapping.from_dataset(ds)
tgm = gm.to_regular(tile_size=512)
src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
x_min, y_min, x_max, y_max = tgm.xy_bbox
dst_h, dst_w = tgm.height, tgm.width
gx = (src_xy[0] - x_min) / tgm.x_res
gy = (src_xy[1] - y_max) / -tgm.y_res
src_h, src_w = gx.shape

TILE, WIN, MARGIN, CI, RI = 16, 24, 2, 24, 6
ft = jnp.float32
nqj, nqi = src_h - 1, src_w - 1
w_row = src_w
n_tj = -(-dst_h // TILE)
n_ti = -(-dst_w // TILE)
cs = 8
n_cj = (n_tj // cs) + 2
n_ci = (n_ti // cs) + 2

gx_d = jnp.asarray(gx, dtype=ft)
gy_d = jnp.asarray(gy, dtype=ft)


def corner_walk(gx, gy):
    gxf = gx.reshape(-1)
    gyf = gy.reshape(-1)
    xm, ym, im, jm, ai, bi, aj, bj = R._affine_seed(gxf, gyf, src_h, src_w, ft)
    pxc = jnp.broadcast_to((jnp.arange(n_ci, dtype=ft) * (cs * TILE))[None, :], (n_cj, n_ci))
    pyc = jnp.broadcast_to((jnp.arange(n_cj, dtype=ft) * (cs * TILE))[:, None], (n_cj, n_ci))
    qi0 = jnp.clip(jnp.nan_to_num(im + ai * (pxc - xm) + bi * (pyc - ym), nan=im).astype(jnp.int32), 0, nqi - 1)
    qj0 = jnp.clip(jnp.nan_to_num(jm + aj * (pxc - xm) + bj * (pyc - ym), nan=jm).astype(jnp.int32), 0, nqj - 1)
    qj_c, qi_c = R._walk_steps_flat(gxf, gyf, w_row, nqj, nqi, qj0, qi0, pxc, pyc, CI)
    qj_f = jnp.repeat(jnp.repeat(qj_c, cs, axis=0), cs, axis=1)[: n_tj + 1, : n_ti + 1]
    qi_f = jnp.repeat(jnp.repeat(qi_c, cs, axis=0), cs, axis=1)[: n_tj + 1, : n_ti + 1]
    pxf = jnp.broadcast_to((jnp.arange(n_ti + 1, dtype=ft) * TILE)[None, :], (n_tj + 1, n_ti + 1))
    pyf = jnp.broadcast_to((jnp.arange(n_tj + 1, dtype=ft) * TILE)[:, None], (n_tj + 1, n_ti + 1))
    cqj, cqi = R._walk_steps_flat(gxf, gyf, w_row, nqj, nqi, qj_f, qi_f, pxf, pyf, RI)
    return cqj, cqi


def bases(cqj, cqi):
    def mm(c):
        lo = jnp.minimum(jnp.minimum(c[:-1, :-1], c[:-1, 1:]), jnp.minimum(c[1:, :-1], c[1:, 1:]))
        hi = jnp.maximum(jnp.maximum(c[:-1, :-1], c[:-1, 1:]), jnp.maximum(c[1:, :-1], c[1:, 1:]))
        return lo, hi
    qj_lo, qj_hi = mm(cqj)
    qi_lo, qi_hi = mm(cqi)
    fits = jnp.all((qj_hi - qj_lo <= WIN - 2 - 2 * MARGIN) & (qi_hi - qi_lo <= WIN - 2 - 2 * MARGIN))
    base_j = jnp.clip(qj_lo - MARGIN, 0, src_h - WIN).reshape(-1)
    base_i = jnp.clip(qi_lo - MARGIN, 0, src_w - WIN).reshape(-1)
    return base_j, base_i, fits


@jax.jit
def v_walk(gx, gy):
    cqj, cqi = corner_walk(gx, gy)
    b_j, b_i, fits = bases(cqj, cqi)
    return b_j.sum() + b_i.sum(), fits


@jax.jit
def v_loads(gx, gy):
    cqj, cqi = corner_walk(gx, gy)
    b_j, b_i, fits = bases(cqj, cqi)
    def load(bj, bi):
        return (lax.dynamic_slice(gx, (bj, bi), (WIN, WIN)),
                lax.dynamic_slice(gy, (bj, bi), (WIN, WIN)))
    wx, wy = jax.vmap(load)(b_j, b_i)
    return wx.sum() + wy.sum(), fits


def timeit(name, fn, *a):
    out = fn(*a)
    float(jnp.asarray(out[0]).reshape(-1)[0])  # sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        float(jnp.asarray(out[0]).reshape(-1)[0])
        ts.append((time.perf_counter() - t0) / 5)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


timeit("stage1+2 (seed+corner walk+bases)", v_walk, gx_d, gy_d)
timeit("stage1-3 (+window loads)", v_loads, gx_d, gy_d)

full = R._build_hybrid_kernel((src_h, src_w), (dst_h, dst_w), ft, UV_DELTA,
                              TILE, WIN, MARGIN, CI, RI)
timeit("full kernel", full, gx_d, gy_d)
