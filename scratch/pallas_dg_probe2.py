"""Probe 2b: dynamic_gather block-shape sensitivity.

Probe 2 (`pallas_dg_probe.py`) measured lane-axis dynamic_gather at
61 Mgather/s (same class as serialized XLA gathers) and sublane-axis
crashed the remote Mosaic compile at (256, 128) blocks.  This variant
tries native-tile-adjacent block shapes to rule out a shape artifact
before rejecting the avenue.
"""
import sys
import time

import numpy as np

CPU = len(sys.argv) > 1 and sys.argv[1] == "cpu"
import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 2048, 2048
rng = np.random.default_rng(0)
src_np = rng.random((H, W), dtype=np.float32)
src = jnp.asarray(src_np)


def timeit(fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_axis0(br, bc):
    def kern(s_ref, j_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(s_ref[...], j_ref[...], axis=0)

    @jax.jit
    def run(src, j):
        return pl.pallas_call(
            kern,
            grid=(H // br, W // bc),
            in_specs=[
                pl.BlockSpec((br, bc), lambda r, c: (r, c)),
                pl.BlockSpec((br, bc), lambda r, c: (r, c)),
            ],
            out_specs=pl.BlockSpec((br, bc), lambda r, c: (r, c)),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            interpret=CPU,
        )(src, j)

    return run


def make_axis1(br, bc):
    def kern(s_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=1)

    @jax.jit
    def run(src, i):
        return pl.pallas_call(
            kern,
            grid=(H // br, W // bc),
            in_specs=[
                pl.BlockSpec((br, bc), lambda r, c: (r, c)),
                pl.BlockSpec((br, bc), lambda r, c: (r, c)),
            ],
            out_specs=pl.BlockSpec((br, bc), lambda r, c: (r, c)),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            interpret=CPU,
        )(src, i)

    return run


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    cases = []
    for br, bc in [(8, 128), (32, 128), (64, 128)]:
        j_np = rng.integers(0, br, size=(H, W)).astype(np.int32)
        want = np.concatenate(
            [
                np.take_along_axis(
                    src_np[r : r + br], j_np[r : r + br], axis=0
                )
                for r in range(0, H, br)
            ]
        )
        cases.append((f"axis0 ({br},{bc})", make_axis0(br, bc), j_np, want))
    for br, bc in [(256, 128), (8, 128)]:
        i_np = rng.integers(0, bc, size=(H, W)).astype(np.int32)
        want = np.concatenate(
            [
                np.take_along_axis(
                    src_np[:, c : c + bc], i_np[:, c : c + bc], axis=1
                )
                for c in range(0, W, bc)
            ],
            axis=1,
        )
        cases.append((f"axis1 ({br},{bc})", make_axis1(br, bc), i_np, want))
    for name, fn, idx_np, want in cases:
        try:
            idx = jnp.asarray(idx_np)
            got = np.asarray(fn(src, idx))
            ok = np.array_equal(got, want)
            dt = timeit(fn, src, idx)
            print(
                f"{name}: {dt*1e3:.2f} ms = {H*W/dt/1e6:.0f} Mgather/s "
                f"exact={ok}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
