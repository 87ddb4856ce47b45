"""Micro-benchmark: Pallas SRW vertical kernel vs XLA tap formulation on TPU.

Shapes mirror the headline 4096x4096 UTM reproject's vertical pass
(d_taps ~ what plan_srw picks there)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from xcube_resampling_tpu.ops.pallas_kernels import (
    srw_vertical_pallas,
    srw_vertical_reference,
)


def _rtt():
    x = jnp.float32(1.0)
    float(x + 1)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(x + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_fn(fn, *args, iters=10):
    probe = jax.jit(lambda acc, x: acc + x.ravel()[0].astype(jnp.float32))
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


def xla_taps(src, pos, base, d_taps, src_h):
    out = jnp.zeros_like(pos)
    for d in range(d_taps):
        idx = jnp.clip(base + d, 0, src_h - 1)
        k = (base + d).astype(jnp.float32)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pos - k[:, None]))
        out = out + wgt * jnp.take(src, idx, axis=0)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    src_h, w, out_h = 4200, 4096, 4096
    for d_taps in (3, 6, 12):
        src = jnp.asarray(rng.random((src_h, w), np.float32))
        base_np = np.clip(
            np.linspace(0, src_h - d_taps - 2, out_h).astype(np.int32), 0, None
        )
        base = jnp.asarray(base_np)
        pos_np = base_np[:, None].astype(np.float32) + rng.random(
            (out_h, w), np.float32
        ) * max(1, d_taps - 2)
        pos = jnp.asarray(pos_np)

        xla_fn = jax.jit(
            lambda s, p, b: xla_taps(s, p, b, d_taps, src_h)
        )
        # srw_vertical_pallas concretizes base on the host by design:
        # call it eagerly (pallas_call inside still compiles for TPU)
        pal_fn = lambda s, p, b: srw_vertical_pallas(
            s, p, b, d_taps, row_block=256
        )

        ref = srw_vertical_reference(
            np.asarray(src), pos_np, base_np, d_taps
        )
        try:
            got = np.asarray(pal_fn(src, pos, base))
            err = float(np.max(np.abs(got - ref)))
            tp = time_fn(pal_fn, src, pos, base)
        except Exception as e:  # noqa: BLE001
            print(f"d_taps={d_taps}: pallas FAILED: {type(e).__name__}: {e}",
                  flush=True)
            tp, err = float("nan"), float("nan")
        tx = time_fn(xla_fn, src, pos, base)
        mpix = out_h * w / 1e6
        print(
            f"d_taps={d_taps}: xla {tx*1e3:.2f} ms ({mpix/tx:.0f} Mpix/s)  "
            f"pallas {tp*1e3:.2f} ms ({mpix/tp:.0f} Mpix/s)  maxerr={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
