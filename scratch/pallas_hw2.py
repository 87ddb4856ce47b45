import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bench import _time_fn
from xcube_resampling_tpu.ops.pallas_kernels import srw_vertical_reference

def build_block_taps(src_shape, pos_shape, base, d_taps, row_block=256):
    src_h, w = src_shape
    out_h = pos_shape[0]
    base_np = np.asarray(base)
    n_blocks = -(-out_h // row_block)
    pad_rows = n_blocks * row_block - out_h
    base_pad = np.pad(base_np, (0, pad_rows), mode="edge")
    m_top = max(0, -int(base_pad.min()))
    m_bot = max(0, int(base_pad.max()) + d_taps - src_h)
    base_sh = base_pad + m_top
    blocks = base_sh.reshape(n_blocks, row_block)
    win_start = (blocks.min(axis=1) // 8) * 8
    span = int((blocks.max(axis=1) - win_start).max())
    win_h = -(-(span + d_taps) // 8) * 8
    pad_h = src_h + m_top + m_bot
    extra = max(0, int(win_start.max()) + win_h - pad_h)
    ws_j = jnp.asarray(win_start, jnp.int32)

    def kernel(ws_ref, src_ref, pos_ref, out_ref, win, sem):
        blk = pl.program_id(0)
        w0 = pl.multiple_of(ws_ref[blk], 8)
        dma = pltpu.make_async_copy(src_ref.at[pl.ds(w0, win_h), :], win, sem)
        dma.start(); dma.wait()
        p = pos_ref[:]
        k0 = (w0 - m_top).astype(jnp.float32)
        acc = jnp.zeros((row_block, w), jnp.float32)
        for d in range(win_h):
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(p - (k0 + d)))
            acc = acc + wgt * win[d, :][None, :]
        out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((row_block, w), lambda blk, ws: (blk, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((row_block, w), lambda blk, ws: (blk, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((win_h, w), jnp.float32), pltpu.SemaphoreType.DMA],
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * row_block, w), jnp.float32))

    @jax.jit
    def fn(src, pos):
        src_pad = jnp.concatenate([
            jnp.repeat(src[:1], m_top, axis=0), src.astype(jnp.float32),
            jnp.repeat(src[-1:], m_bot + extra, axis=0)], axis=0)
        pos_p = jnp.pad(pos, ((0, pad_rows), (0, 0))) if pad_rows else pos
        return call(ws_j, src_pad, pos_p)[:out_h]
    return fn, win_h

for (src_h, w, out_h, scale, tilt) in [(512, 4096, 4096, 0.118, 0.002)]:
    rng = np.random.default_rng(0)
    src = rng.random((src_h, w), dtype=np.float32)
    rr = np.arange(out_h, dtype=np.float32)[:, None]
    cc = np.arange(w, dtype=np.float32)[None, :]
    pos = scale * rr + tilt * cc
    base = np.clip((scale * np.arange(out_h)).astype(np.int32) - 2, -4, src_h)
    d_taps = 2 + int(np.ceil(tilt * w)) + 4
    fn, win_h = build_block_taps(src.shape, pos.shape, base, d_taps, row_block=128)
    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(src), jnp.asarray(pos)))
    print(f"[{out_h}x{w}] compile+first {time.time()-t0:.1f}s win_h {win_h} d_taps {d_taps} "
          f"maxerr {np.abs(out - srw_vertical_reference(src, pos, base, d_taps)).max():.2e}", flush=True)
    dt = _time_fn(fn, jnp.asarray(src), jnp.asarray(pos))
    print(f"[{out_h}x{w}] pallas block-taps steady: {dt*1e3:.3f} ms -> {out_h*w/dt/1e6:.0f} Mpix/s", flush=True)

    bj = jnp.asarray(base)
    @jax.jit
    def xla_taps(s, p):
        acc = jnp.zeros(p.shape, jnp.float32)
        for dd in range(d_taps):
            idx = jnp.clip(bj + dd, 0, src_h - 1)
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(p - (bj + dd)[:, None].astype(jnp.float32)))
            acc = acc + wgt * jnp.take(s, idx, axis=0)
        return acc
    dt = _time_fn(xla_taps, jnp.asarray(src), jnp.asarray(pos))
    print(f"[{out_h}x{w}] xla taps steady:          {dt*1e3:.3f} ms -> {out_h*w/dt/1e6:.0f} Mpix/s", flush=True)
