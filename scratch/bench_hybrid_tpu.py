"""Hybrid SRW at the full global 4326->3035 bench config on real TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.srw import plan_srw_hybrid, make_srw_hybrid_fn, make_region_reproject_fn
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn


def _rtt():
    x = jnp.float32(1.0)
    float(x + 1)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(x + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_fn(fn, *args, iters=5):
    probe = jax.jit(lambda acc, x: acc + jnp.nan_to_num(x).ravel()[0].astype(jnp.float32))
    rtt = _rtt()
    acc = jnp.float32(0.0)
    for _ in range(2):
        acc = probe(acc, fn(*args))
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = probe(acc, fn(*args))
    float(acc)
    return max((time.perf_counter() - t0 - rtt) / iters, 1e-9)


def main():
    print("devices:", jax.devices(), flush=True)
    src_w, src_h = 7200, 3600
    source_gm = GridMapping.regular(
        size=(src_w, src_h), xy_min=(-180.0, -90.0), xy_res=0.05,
        crs="epsg:4326",
    )
    out_w = out_h = 4096
    target_gm = GridMapping.regular(
        size=(out_w, out_h), xy_min=(2000000.0, 1000000.0), xy_res=1500.0,
        crs="epsg:3035",
    )
    t0 = time.time()
    plan = plan_srw_hybrid(source_gm, target_gm)
    print("plan time", time.time() - t0, flush=True)
    if plan is None:
        print("hybrid whole-domain: no plan; trying region decomposition",
              flush=True)
        src = jnp.asarray(
            np.random.default_rng(0).random((src_h, src_w), dtype=np.float32)
        )
        t0 = time.time()
        rfn = make_region_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
        print("region build", time.time() - t0, "fn", rfn is not None, flush=True)
        if rfn is not None:
            t0 = time.time()
            out = rfn(src)
            float(jnp.nan_to_num(out).ravel()[0])
            print("region first call", time.time() - t0, "s", flush=True)
            dt = time_fn(rfn, src, iters=3)
            print(f"region bilinear: {out_w*out_h/dt/1e6:.1f} Mpix/s ({dt*1e3:.2f} ms)", flush=True)
        gf = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
        dt = time_fn(gf, src, iters=3)
        print(f"gather bilinear: {out_w*out_h/dt/1e6:.1f} Mpix/s ({dt*1e3:.2f} ms)", flush=True)
        return
    print(
        "plan:", dict(d_v=plan.d_v, d_h=plan.d_h, col_tile=plan.col_tile,
                      row_tile=plan.row_tile, bits_v=plan.bits_v,
                      bits_h=plan.bits_h),
        flush=True,
    )
    src = jnp.asarray(
        np.random.default_rng(0).random((src_h, src_w), dtype=np.float32)
    )
    for interp in ("bilinear", "nearest"):
        fn = make_srw_hybrid_fn(plan, interp, np.nan)
        t0 = time.time()
        out = fn(src)
        float(jnp.nan_to_num(out).ravel()[0])
        print(f"{interp}: first call {time.time()-t0:.1f}s", flush=True)
        dt = time_fn(fn, src)
        print(
            f"hybrid {interp}: {out_w*out_h/dt/1e6:.1f} Mpix/s "
            f"({dt*1e3:.2f} ms)",
            flush=True,
        )
    # gather baseline for reference
    gf = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    dt = time_fn(gf, src)
    print(f"gather bilinear: {out_w*out_h/dt/1e6:.1f} Mpix/s ({dt*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
