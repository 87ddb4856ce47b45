"""Does a *batched* row-take (per-tile index vectors) stream like a plain
row-take on TPU, or does XLA serialize it like a general gather?

Shapes mirror a hybrid-SRW vertical pass on the global 4326->3035 config:
src (H=3600, W=7200) split into 128-wide column tiles."""

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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    H, W = 3600, 7168
    out_h = 4096
    for tile in (128, 256, 512):
        nt = W // tile
        src = jnp.asarray(rng.random((H, W), np.float32))
        src_t = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(src).reshape(H, nt, tile).transpose(1, 0, 2)
            )
        )  # (nt, H, tile)
        idx = jnp.asarray(
            rng.integers(0, H, size=(nt, out_h)).astype(np.int32)
        )

        # batched row-gather: out[t, j, c] = src_t[t, idx[t, j], c]
        bat = jax.jit(
            lambda s, i: jnp.take_along_axis(s, i[:, :, None], axis=1)
        )
        # plain row-take baseline (shared index): out[j, c] = src[i[j], c]
        plain = jax.jit(lambda s, i: jnp.take(s, i[0], axis=0))
        # vmapped take over tiles (should lower same as take_along_axis)
        vm = jax.jit(
            jax.vmap(lambda s, i: jnp.take(s, i, axis=0), in_axes=(0, 0))
        )

        tb = time_fn(bat, src_t, idx)
        tp = time_fn(plain, src, idx)
        tv = time_fn(vm, src_t, idx)
        mpix = out_h * W / 1e6
        print(
            f"tile={tile}: batched take_along {tb*1e3:.2f} ms "
            f"({mpix/tb:.0f} Mpix/s)  vmap-take {tv*1e3:.2f} ms "
            f"({mpix/tv:.0f} Mpix/s)  plain row-take {tp*1e3:.2f} ms "
            f"({mpix/tp:.0f} Mpix/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
