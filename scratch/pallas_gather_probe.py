"""Probe: does Mosaic support per-lane dynamic gathers inside a Pallas TPU
kernel, and at what rate?

Three formulations of ``out[r, c] = src[j[r, c], i[r, c]]`` (the per-pixel
gather the XLA kernel serializes at ~85 M gathers/s):

  A. jnp.take_along_axis along sublanes within a VMEM block (tpu
     dynamic_gather if Mosaic lowers it)
  B. jnp.take with flattened indices (1D dynamic gather)
  C. reference: plain XLA jnp.take outside pallas

Run on the real TPU: python scratch/pallas_gather_probe.py
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 2048, 2048          # output
SH, SW = 2048, 2048        # source

rng = np.random.default_rng(0)
src = jnp.asarray(rng.random((SH, SW), dtype=np.float32))
jj = jnp.asarray(rng.integers(0, SH, size=(H, W)), dtype=jnp.int32)
ii = jnp.asarray(rng.integers(0, SW, size=(H, W)), dtype=jnp.int32)
# column-local variant: j varies freely, i == own column (separable row
# gather, what the ESW vertical pass needs per column)
jj_loc = jnp.asarray(rng.integers(0, SH, size=(H, W)), dtype=jnp.int32)


def timeit(fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    # remote-backend sync probe
    float(np.asarray(out)[0, 0] if hasattr(out, "shape") else out)
    return (time.perf_counter() - t0) / iters


# --- A: per-column row gather inside pallas (take_along_axis, axis=0) ----
def kern_a(src_ref, j_ref, o_ref):
    s = src_ref[...]            # (SH, 256) block
    j = j_ref[...]              # (256, 256) block of row ids
    o_ref[...] = jnp.take_along_axis(s, j % SH, axis=0)[: o_ref.shape[0]]


def run_a():
    bw = 256
    return pl.pallas_call(
        kern_a,
        grid=(H // 256, W // bw),
        in_specs=[
            pl.BlockSpec((SH, bw), lambda r, c: (0, c)),
            pl.BlockSpec((256, bw), lambda r, c: (r, c)),
        ],
        out_specs=pl.BlockSpec((256, bw), lambda r, c: (r, c)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )(src, jj_loc)


# --- C: XLA baselines ------------------------------------------------------
@jax.jit
def xla_flat(src, jj, ii):
    return jnp.take(src.ravel(), jj * SW + ii)


@jax.jit
def xla_cols(src, jj):
    return jnp.take_along_axis(src, jj, axis=0)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, fn, args in [
        ("XLA flat 2D gather", xla_flat, (src, jj, ii)),
        ("XLA take_along_axis axis=0", xla_cols, (src, jj_loc)),
    ]:
        try:
            dt = timeit(fn, *args)
            print(f"{name}: {dt*1e3:.2f} ms = {H*W/dt/1e6:.0f} Mgather/s")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
    try:
        dt = timeit(run_a)
        ok = np.array_equal(
            np.asarray(run_a()),
            np.asarray(xla_cols(src, jj_loc)),
        )
        print(
            f"pallas take_along_axis axis=0: {dt*1e3:.2f} ms = "
            f"{H*W/dt/1e6:.0f} Mgather/s exact={ok}"
        )
    except Exception as e:
        print(f"pallas take_along_axis: FAILED {type(e).__name__}: {e}")
