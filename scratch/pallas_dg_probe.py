"""Probe 2: Mosaic `tpu.dynamic_gather` rates via Pallas.

The Mosaic gather lowering (jax/_src/pallas/mosaic/lowering.py,
`_gather_lowering_rule`) supports `jnp.take_along_axis(x, j, axis)` ONLY
when x, j and out all share one block shape — per-lane dynamic gather
along sublanes (axis 0) or lanes (axis 1).  The round-3 probe failed its
assert because the operand block was taller than the index block.

Formulations measured here (all (2048, 2048) f32, j arbitrary in-range):

  A. block-local row gather: j within the 256-row block (1 dynamic_gather
     per block) — upper bound for the within-window case (d_v <= block).
  B. column-local row gather, arbitrary j in [0, H): loop q over the 8
     source row blocks, 1 dynamic_gather + select each.
  C. lane gather axis=1, j local to the 128-lane block.
  D. XLA take_along_axis axis=0 (the serialized-gather baseline).
  E. XLA flat 2D gather (the mosaic gather-piece baseline, ~85 M/s).

CPU validation: python scratch/pallas_dg_probe.py cpu   (interpret mode)
TPU measure:    python scratch/pallas_dg_probe.py
"""
import sys
import time

import numpy as np

CPU = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 2048, 2048
BR, BC = 256, 128  # block rows (sublanes x 32), lanes

rng = np.random.default_rng(0)
src_np = rng.random((H, W), dtype=np.float32)
src = jnp.asarray(src_np)
j_loc_np = rng.integers(0, BR, size=(H, W)).astype(np.int32)
j_any_np = rng.integers(0, H, size=(H, W)).astype(np.int32)
i_loc_np = rng.integers(0, BC, size=(H, W)).astype(np.int32)
j_loc, j_any, i_loc = map(jnp.asarray, (j_loc_np, j_any_np, i_loc_np))


def timeit(fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])  # real sync on the remote backend
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


# --- A: block-local row gather (1 dynamic_gather / block) ---------------
def kern_a(s_ref, j_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(s_ref[...], j_ref[...], axis=0)


@jax.jit
def run_a(src, j):
    return pl.pallas_call(
        kern_a,
        grid=(H // BR, W // BC),
        in_specs=[
            pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
            pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
        ],
        out_specs=pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=CPU,
    )(src, j)


# --- B: arbitrary-row column-local gather (q-blocks + select) -----------
def kern_b(s_ref, j_ref, o_ref):
    j = j_ref[...]
    q_all = j // BR
    rem = j % BR
    out = jnp.zeros(o_ref.shape, jnp.float32)
    for q in range(H // BR):
        g = jnp.take_along_axis(
            s_ref[q * BR : (q + 1) * BR, :], rem, axis=0
        )
        out = jnp.where(q_all == q, g, out)
    o_ref[...] = out


@jax.jit
def run_b(src, j):
    return pl.pallas_call(
        kern_b,
        grid=(H // BR, W // BC),
        in_specs=[
            pl.BlockSpec((H, BC), lambda r, c: (0, c)),
            pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
        ],
        out_specs=pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=CPU,
    )(src, j)


# --- C: lane gather axis=1 ---------------------------------------------
def kern_c(s_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=1)


@jax.jit
def run_c(src, i):
    return pl.pallas_call(
        kern_c,
        grid=(H // BR, W // BC),
        in_specs=[
            pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
            pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
        ],
        out_specs=pl.BlockSpec((BR, BC), lambda r, c: (r, c)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=CPU,
    )(src, i)


# --- XLA baselines ------------------------------------------------------
@jax.jit
def xla_cols(src, j):
    return jnp.take_along_axis(src, j, axis=0)


@jax.jit
def xla_flat(src, j, i):
    return jnp.take(src.ravel(), j * W + i)


def ref_a():
    out = np.empty((H, W), np.float32)
    for rb in range(H // BR):
        blk = src_np[rb * BR : (rb + 1) * BR]
        jb = j_loc_np[rb * BR : (rb + 1) * BR]
        out[rb * BR : (rb + 1) * BR] = np.take_along_axis(blk, jb, axis=0)
    return out


def ref_c():
    out = np.empty((H, W), np.float32)
    for cb in range(W // BC):
        blk = src_np[:, cb * BC : (cb + 1) * BC]
        ib = i_loc_np[:, cb * BC : (cb + 1) * BC]
        out[:, cb * BC : (cb + 1) * BC] = np.take_along_axis(blk, ib, axis=1)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    checks = [
        ("A block-local row dg", run_a, (src, j_loc), ref_a()),
        (
            "B any-row col-local dg (8q)",
            run_b,
            (src, j_any),
            np.take_along_axis(src_np, j_any_np, axis=0),
        ),
        ("C lane dg axis=1", run_c, (src, i_loc), ref_c()),
        (
            "D XLA take_along_axis",
            xla_cols,
            (src, j_any),
            np.take_along_axis(src_np, j_any_np, axis=0),
        ),
        (
            "E XLA flat 2D gather",
            xla_flat,
            (src, j_any, i_loc),
            src_np[j_any_np, i_loc_np],
        ),
    ]
    for name, fn, args, want in checks:
        try:
            got = np.asarray(fn(*args))
            ok = np.array_equal(got, want)
            dt = timeit(fn, *args)
            print(
                f"{name}: {dt*1e3:.2f} ms = {H*W/dt/1e6:.0f} Mgather/s "
                f"exact={ok}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
