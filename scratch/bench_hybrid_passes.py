"""Isolate hybrid-kernel constructs at a failing region's shapes."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # vertical: (T=8, H=480, tile=128), out_h=1024, 13 taps
    T, H, tile, out_h, d_v = 8, 480, 128, 1024, 13
    src_t = jnp.asarray(rng.random((T, H, tile), np.float32))
    bvt = jnp.asarray(rng.integers(0, H - d_v, (T, out_h)).astype(np.int32))
    pos_t = jnp.asarray(rng.random((T, out_h, tile), np.float32)) + bvt[..., None]

    def vert(src_t, bvt, pos_t):
        acc = jnp.zeros((T, out_h, tile), jnp.float32)
        for d in range(d_v):
            idx = jnp.clip(bvt + d, 0, H - 1)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_t - (bvt + d)[..., None]))
            taken = jnp.take_along_axis(
                src_t, jnp.broadcast_to(idx[:, :, None], acc.shape), axis=-2
            )
            acc = acc + w * taken
        return acc

    f = jax.jit(vert)
    dt = time_fn(f, src_t, bvt, pos_t)
    mpix = T * out_h * tile / 1e6
    print(f"vertical batched take: {dt*1e3:.2f} ms ({mpix/dt:.0f} Mpix/s)",
          flush=True)

    # horizontal: (Tr=64, row_tile=16, W=960), out_w=1024, 9 taps
    Tr, rt, W, out_w, d_h = 64, 16, 960, 1024, 9
    v_t = jnp.asarray(rng.random((Tr, rt, W), np.float32))
    bh = jnp.asarray(rng.integers(0, W - d_h, (Tr, out_w)).astype(np.int32))
    pos_h = jnp.asarray(rng.random((Tr, rt, out_w), np.float32)) + bh[:, None, :]

    def horiz(v_t, bh, pos_h):
        acc = jnp.zeros((Tr, rt, out_w), jnp.float32)
        for d in range(d_h):
            idx = jnp.clip(bh + d, 0, W - 1)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_h - (bh + d)[:, None, :]))
            taken = jnp.take_along_axis(
                v_t, jnp.broadcast_to(idx[:, None, :], acc.shape), axis=-1
            )
            acc = acc + w * taken
        return acc

    f2 = jax.jit(horiz)
    dt = time_fn(f2, v_t, bh, pos_h)
    mpix = Tr * rt * out_w / 1e6
    print(f"horizontal batched take (lanes): {dt*1e3:.2f} ms "
          f"({mpix/dt:.0f} Mpix/s)", flush=True)

    # horizontal variant: transpose + sublane take + transpose back
    def horiz_t(v_t, bh, pos_h):
        vt2 = jnp.swapaxes(v_t, -1, -2)  # (Tr, W, rt)
        acc = jnp.zeros((Tr, out_w, rt), jnp.float32)
        for d in range(d_h):
            idx = jnp.clip(bh + d, 0, W - 1)
            taken = jnp.take_along_axis(
                vt2, jnp.broadcast_to(idx[:, :, None], acc.shape), axis=-2
            )
            acc = acc + taken  # weights applied post-transpose equivalently
        return jnp.swapaxes(acc, -1, -2)

    f3 = jax.jit(horiz_t)
    dt = time_fn(f3, v_t, bh, pos_h)
    print(f"horizontal via transpose + sublane take: {dt*1e3:.2f} ms "
          f"({mpix/dt:.0f} Mpix/s)", flush=True)

    # vertical with small T and shifts (bits passes) for completeness
    bits = 9
    sv = jnp.asarray(rng.integers(0, 400, (tile * T,)).astype(np.int32))
    src2d = jnp.asarray(rng.random((H, tile * T), np.float32))

    def shifts(src2d, sv):
        out = src2d
        for b in range(bits):
            k = 1 << b
            rolled = jnp.concatenate(
                [out[k:, :], jnp.repeat(out[-1:, :], k, axis=0)], axis=0
            )
            out = jnp.where(((sv >> b) & 1).astype(bool)[None, :], rolled, out)
        return out

    f4 = jax.jit(shifts)
    dt = time_fn(f4, src2d, sv)
    print(f"9 shift passes over (480, 1024): {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
