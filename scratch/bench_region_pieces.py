"""Time individual region pieces of the global 4326->3035 config on TPU to
find which construct is slow."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
import xcube_resampling_tpu.ops.srw as srw


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
    probe = jax.jit(
        lambda acc, x: acc + jnp.nan_to_num(x).ravel()[0].astype(jnp.float32)
    )
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
    src_gm = GridMapping.regular(
        size=(7200, 3600), xy_min=(-180, -90), xy_res=0.05, crs="epsg:4326"
    )
    rng = np.random.default_rng(0)
    data = rng.random((3600, 7200), dtype=np.float32)

    # four representative 1024x1024 regions: center, west, east, south
    cases = [(2048, 3072, 1024, 2048), (1024, 2048, 0, 1024),
             (1024, 2048, 3072, 4096), (3072, 4096, 1024, 2048)]
    for (r0, r1, c0, c1) in cases:
        gm = GridMapping.regular(
            size=(c1 - c0, r1 - r0),
            xy_min=(2000000.0 + c0 * 1500.0,
                    1000000.0 + (4096 - r1) * 1500.0),
            xy_res=1500.0, crs="epsg:3035",
        )
        f = srw._coarse_geometry(src_gm, gm, 16)
        win = None
        sg = src_gm
        if f is not None:
            w = srw._source_window_gm(src_gm, f, margin=56)
            if w:
                sg, win = w
        kind = None
        for st in (16, 4):
            f2 = srw._coarse_geometry(sg, gm, st)
            if f2 is None:
                continue
            if srw._fields_interp_err(f2) > 0.5:
                continue
            t_ = srw.plan_srw(sg, gm, step=st, fields=f2)
            a_ = srw.plan_srw_aligned(sg, gm, step=st, fields=f2)
            h_ = srw.plan_srw_hybrid(sg, gm, step=st, fields=f2)
            cands = []
            if t_:
                cands.append((t_.d_v + t_.d_h, "tiled", t_))
            if a_:
                cands.append((a_.bits_v + a_.bits_h + a_.d_v + a_.d_h,
                              "aligned", a_))
            if h_:
                cands.append((h_.bits_v + h_.bits_h + h_.d_v + h_.d_h + 4,
                              "hybrid", h_))
            if not cands:
                continue
            _, kind, plan = min(cands, key=lambda c: c[0])
            break
        if kind is None:
            print(f"region {r0},{c0}: gather", flush=True)
            continue
        if kind == "tiled":
            fn = srw.make_srw_fn(plan, "bilinear", np.nan)
            info = f"tiled d={plan.d_v}/{plan.d_h} tile={plan.col_tile}/{plan.row_tile}"
        elif kind == "aligned":
            fn = srw.make_srw_aligned_fn(plan, "bilinear", np.nan)
            info = f"aligned d={plan.d_v}/{plan.d_h} bits={plan.bits_v}/{plan.bits_h}"
        else:
            fn = srw.make_srw_hybrid_fn(plan, "bilinear", np.nan)
            info = (f"hybrid d={plan.d_v}/{plan.d_h} bits={plan.bits_v}/"
                    f"{plan.bits_h} tile={plan.col_tile}/{plan.row_tile}")
        sub = jnp.asarray(
            data[win[0]:win[1], win[2]:win[3]] if win else data
        )
        t0 = time.time()
        out = fn(sub)
        float(jnp.nan_to_num(out).ravel()[0])
        comp = time.time() - t0
        dt = time_fn(fn, sub)
        mpix = (r1 - r0) * (c1 - c0) / 1e6
        print(
            f"region {r0},{c0} [{info}] win={None if not win else (win[1]-win[0], win[3]-win[2])}: "
            f"compile {comp:.0f}s run {dt*1e3:.2f} ms ({mpix/dt:.0f} Mpix/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
