"""Pallas TPU kernels for the hottest resampling inner loops.

The XLA formulation of the SRW vertical pass (:mod:`.srw`) re-reads the
source array once per tap (d_v full HBM streams).  The kernel below DMAs
each output-row-block's source window into VMEM once and performs all taps
from on-chip memory.

**Block-static taps** are the design that made Mosaic win: every row of
the block accumulates over EVERY row of the block's shared source window
with *static* indices — no per-row or per-group dynamic slices, no
``fori_loop``, just ``win_h`` unrolled (row_block, W) VPU FMAs.  Rows
outside a pixel's hat support contribute zero weight, so the extra
arithmetic is pure VPU headroom in exchange for perfect vectorization.

Hardware status (v5e, 2026-08, round 2): **7.5 Gpix/s** steady-state on a
4096x4096 bilinear vertical pass (win_h 40) vs **5.5 Gpix/s** for the XLA
tap formulation of the same pass — bit-exact against the numpy reference
(maxerr 0.0 on hardware).  The round-1 formulation (per-8-row-group
dynamic slices inside ``fori_loop``) ran at 16-25 Mpix/s: data-dependent
VMEM slicing defeats Mosaic's vectorizer; block-static indexing is the
fix.  Caveats that keep XLA the *default* tier: Mosaic compiles of the
unrolled loop take minutes through this environment's remote XLA service
(seconds locally), and ``win_h`` inflates toward uneconomical sizes when
the per-block base span is large (strong rotation) — the planner's
row_block shrink bounds VMEM, not FLOPs.  Callers opt in via
``XRTPU_PALLAS=1`` where the geometry suits (mild warps, reused
geometry).

Pattern per the TPU Pallas playbook: scalar-prefetched per-block window
offsets, ``pl.ANY``-space source with an explicit
``pltpu.make_async_copy`` windowed DMA, VMEM scratch + DMA semaphore,
8-aligned window origins, and a VMEM-budgeted row block.
"""

from __future__ import annotations

import numpy as np


def srw_vertical_pallas(
    src,
    pos,
    base,
    d_taps: int,
    row_block: int = 128,
    interpret: bool = False,
):
    """Vertical multi-tap resample:
    ``out[j, c] = sum_d hat(pos[j, c] - (base[j] + d)) * src[base[j] + d, c]``
    with clamp-to-edge source reads, via block-static taps (see module
    docstring).

    Args:
        src: (src_h, W) float32 source.
        pos: (out_h, W) float32 row-coordinate positions.
        base: (out_h,) int32 per-output-row first tap (may be out of range;
            reads clamp to the source edge, weights keep true positions).
        d_taps: static tap count.
        row_block: output rows per grid step (auto-shrunk to the VMEM
            budget).
        interpret: run in interpreter mode (CPU testing).

    Returns:
        (out_h, W) float32.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    src = jnp.asarray(src, jnp.float32)
    pos = jnp.asarray(pos, jnp.float32)
    base_np = np.asarray(base, np.int32)
    src_h, w = src.shape
    out_h = pos.shape[0]

    # auto-shrink the row block to the VMEM budget: the double-buffered
    # working set is the pos and out blocks plus the source window, whose
    # height grows with the per-block base span
    def _layout(rb):
        nb = -(-out_h // rb)
        padded = np.pad(base_np, (0, nb * rb - out_h), mode="edge")
        blocks = padded.reshape(nb, rb)
        m_top_ = max(0, -int(padded.min()))
        shifted = blocks + m_top_
        ws = (shifted.min(axis=1) // 8) * 8
        span = int((shifted.max(axis=1) - ws).max())
        wh = -(-(span + d_taps) // 8) * 8
        return nb, padded, m_top_, shifted, ws, wh

    row_block = max(8, min(row_block, -(-out_h // 8) * 8))
    while row_block > 8:
        nb, padded, m_top, shifted, win_start, win_h = _layout(row_block)
        if (2 * 2 * row_block + 2 * win_h) * w * 4 <= 12 * 2**20:
            break
        row_block //= 2
    else:
        nb, padded, m_top, shifted, win_start, win_h = _layout(row_block)

    n_blocks = nb
    pad_rows = n_blocks * row_block - out_h
    if pad_rows:
        pos = jnp.pad(pos, ((0, pad_rows), (0, 0)))

    m_bot = max(0, int(padded.max()) + d_taps - src_h)
    pad_h = src_h + m_top + m_bot
    extra = max(0, int(win_start.max()) + win_h - pad_h)
    # edge-pad the source so every window row reads a real row (clamp-to-
    # edge values, true-position weights — identical to the XLA path)
    src_pad = jnp.concatenate(
        [
            jnp.repeat(src[:1], m_top, axis=0),
            src,
            jnp.repeat(src[-1:], m_bot + extra, axis=0),
        ],
        axis=0,
    )
    ws_j = jnp.asarray(win_start, jnp.int32)

    def kernel(ws_ref, src_ref, pos_ref, out_ref, win, sem):
        blk = pl.program_id(0)
        w0 = pl.multiple_of(ws_ref[blk], 8)
        dma = pltpu.make_async_copy(src_ref.at[pl.ds(w0, win_h), :], win, sem)
        dma.start()
        dma.wait()
        p = pos_ref[:]  # (row_block, W)
        k0 = (w0 - m_top).astype(jnp.float32)
        acc = jnp.zeros((row_block, w), jnp.float32)
        for d in range(win_h):
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(p - (k0 + d)))
            acc = acc + wgt * win[d, :][None, :]
        out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # win_start
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # src stays off-chip
            pl.BlockSpec(
                (row_block, w), lambda blk, ws: (blk, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (row_block, w), lambda blk, ws: (blk, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win_h, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * row_block, w), jnp.float32),
        interpret=interpret,
    )(ws_j, src_pad, pos)
    return out[:out_h]


def srw_vertical_reference(src, pos, base, d_taps: int):
    """Numpy semantics twin of :func:`srw_vertical_pallas`."""
    src = np.asarray(src)
    pos = np.asarray(pos)
    base = np.asarray(base)
    src_h, w = src.shape
    out = np.zeros((pos.shape[0], w), np.float32)
    for d in range(d_taps):
        idx = np.clip(base + d, 0, src_h - 1)
        k = (base + d).astype(np.float32)
        wgt = np.maximum(0.0, 1.0 - np.abs(pos - k[:, None]))
        out += wgt * src[idx, :]
    return out
