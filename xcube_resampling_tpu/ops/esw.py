"""Exact separable warp (ESW): gather-free reprojection that reproduces the
direct bilinear/nearest gather kernel EXACTLY (bit-exact for nearest, a
couple of float32 ulp for bilinear — lerp-order only).

The SRW strategies (ops/srw.py) evaluate each source column's vertical
profile at the *reparametrized* row position iy*(r, c), which deviates from
the pixel's true row position iy(r, x) by up to the warp's local rotation
slope — hence the default-path fidelity gate (slope <= 0.2).  ESW removes
the approximation instead of gating it:

* The **vertical pass** does not interpolate.  For every (output row r,
  source column c) it *selects* S consecutive source rows anchored at
  m(r,c) = floor(iy*(r,c) - (S-2)/2), producing S sample fields
  ``V_s[r,c] = src[m(r,c)+s, c]``.
* The **horizontal pass** knows the pixel's TRUE clamped row position
  iy(r,x) (interpolated from the same float32 coarse field the gather
  kernel uses, in GLOBAL source index space) and evaluates the piecewise-
  linear column profile exactly from the S samples: with y0 = floor(iy_cl)
  and fy = iy_cl - y0,
  ``colval(c) = V[y0-m] + fy * (V[y0-m+1] - V[y0-m])`` — identical to the
  gather kernel's per-column vertical lerp, because the sample window
  covers [y0, y0+1] whenever |iy - iy*| <= (S-2)/2 (verified at plan time
  with margin).  The two column taps i0, i0+1 are then combined as
  ``cv0 + fx*(cv1-cv0)`` — the gather formula.

Both passes use the tiled-tap layout of the fast SRW kernel (ops/srw.py
make_srw_fn): per-(row, col-tile) tap bases, lane-shared ``jnp.take``
gathers and elementwise selects, which XLA fuses into single streaming
passes — no transposes, no materialized (S, out_h, out_w) intermediates.

When the kernel runs on a cropped source window, positions / floors /
clamps still use the GLOBAL float32 coordinate fields (bit-identical to
the gather kernel) and the integer window offset is subtracted only after
rounding — float subtraction before floor/rint could flip ties.

The result: direct-bilinear semantics (no two-pass filter deviation, no
fidelity gate) at streaming speed, valid for local rotation slopes up to
~(S-2)/2 px/px (S adapts, default cap 10 -> slope ~4, rotation ~76 deg).

Reference behavior matched: xcube_resampling/reproject.py:268-335 (the
per-pixel inverse-transform + bilinear gather semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..gridmapping import GridMapping
from .reproject_ops import _interp_field
from .srw import (
    _Fields,
    _coarse_geometry,
    _interp_cols,
    _interp_rows,
)


@dataclass
class ESWPlan:
    """Tiled exact-warp plan (see module docstring).

    ``ix_c``/``iy_c`` hold GLOBAL source indices (float32 casts of the same
    float64 fields the gather kernel uses) even when the kernel runs on a
    cropped source window; ``iystar_c`` and the tap bases are window-
    relative."""

    iystar_c: np.ndarray  # (ncj, ncc) float32 coarse reparametrized rows
    ix_c: np.ndarray  # (ncj, nci) float32 coarse source-col field (global)
    iy_c: np.ndarray  # (ncj, nci) float32 coarse source-row field (global)
    step: int
    n_samples: int  # S: consecutive source rows kept per (r, c)
    base_v: np.ndarray  # (out_h, n_col_tiles) int32 vertical tap bases
    d_v: int
    col_tile: int
    base_h: np.ndarray  # (n_row_tiles, out_w) int32 horizontal tap bases
    d_h: int
    row_tile: int
    # optional shift alignment (rotation-heavy warps): log2 roll passes
    # remove the mean coordinate trend so the per-tile tap spans stay
    # small; bases/selection then live in the shifted (residual) space
    s_v: np.ndarray | None  # (src_w,) int32 >= 0 upward shift per src col
    bits_v: int
    s_h: np.ndarray | None  # (out_h,) int32 >= 0 left shift per out row
    bits_h: int
    src_h: int  # window dims (== global when not cropped)
    src_w: int
    out_h: int
    out_w: int
    src_h_g: int  # global source dims (validity/clamping space)
    src_w_g: int
    j_off: int  # window origin in global source indices
    i_off: int


def _max_row_deviation(fields: _Fields, refine: int = 2) -> float:
    """Max over valid sample points of |iy_cl(r,x) - iy*(r, c_tap)| for both
    column taps c_tap in {floor(ix_cl), floor(ix_cl)+1}.

    Evaluated on a ``refine``-times refined coarse grid (O(ncj*nci), not
    O(out*src) — the planner runs on a single host core): between nodes all
    fields interpolate (bi)linearly, so the composition's interior extrema
    are quadratic-ish in the cell and half-step sampling bounds them to
    within a fraction the caller's sample margin absorbs."""
    step = fields.step
    src_h, src_w = fields.src_h, fields.src_w
    out_h, out_w = fields.out_h, fields.out_w
    iystar = fields.iystar64

    fine = step / refine
    rows = np.arange(0, out_h, fine, dtype=np.float64)[:, None]
    cols = np.arange(0, out_w, fine, dtype=np.float64)[None, :]
    ix = _interp_field(fields.ix64, rows, cols, step, np)
    iy = _interp_field(fields.iy64, rows, cols, step, np)

    valid = (ix > -0.5) & (ix < src_w - 0.5) & (iy > -0.5) & (iy < src_h - 0.5)
    if not valid.any():
        return 0.0
    ix_cl = np.clip(ix, 0, src_w - 1)
    iy_cl = np.clip(iy, 0, src_h - 1)

    # iy* interpolated to the refined output rows
    rr = rows[:, 0] / step
    j0 = np.clip(rr.astype(np.int64), 0, iystar.shape[0] - 2)
    fj = (rr - j0)[:, None]
    p_rows = iystar[j0, :] * (1 - fj) + iystar[j0 + 1, :] * fj

    ncc = iystar.shape[1]
    dev = np.zeros_like(ix_cl)
    for c_tap in (np.floor(ix_cl), np.floor(ix_cl) + 1):
        c_tap = np.minimum(c_tap, src_w - 1)
        k0 = np.clip((c_tap / step).astype(np.int64), 0, ncc - 2)
        frac = c_tap / step - k0
        pa = np.take_along_axis(p_rows, k0, axis=1)
        pb = np.take_along_axis(p_rows, k0 + 1, axis=1)
        p = pa + frac * (pb - pa)
        dev = np.maximum(dev, np.abs(iy_cl - p))
    return float(dev[valid].max())


def plan_esw(
    source_gm: GridMapping,
    target_gm: GridMapping,
    step: int = 16,
    max_taps: int = 40,
    max_samples: int = 10,
    fields: _Fields | None = None,
    fields_global: _Fields | None = None,
    win: tuple[int, int, int, int] | None = None,
) -> ESWPlan | None:
    """Build an exact-warp plan, or None when the mapping is unsuitable
    (non-monotone rows near a projection singularity, a row deviation that
    would need more than ``max_samples`` kept rows, or tap counts beyond
    ``max_taps`` at every tile size).

    For a cropped source window, pass the window-relative ``fields`` (the
    tap machinery plans in window space), the uncropped ``fields_global``
    and the window ``win`` = (j0, j1, i0, i1): the plan then stores the
    global coordinate fields for bit-exact positions."""
    if fields is None:
        fields = _coarse_geometry(source_gm, target_gm, step)
    if fields is None:
        return None
    if fields_global is None:
        fields_global = fields
    j_off, i_off = (win[0], win[2]) if win is not None else (0, 0)

    iystar = fields.iystar64
    ix64 = fields.ix64
    src_h, src_w = fields.src_h, fields.src_w
    out_h, out_w = fields.out_h, fields.out_w
    step = fields.step

    # sample count: window [m, m+S-1] covers [y0, y0+1] whenever
    # |iy - iy*| <= (S-2)/2; the deviation is measured on a refined coarse
    # grid, the margin covers interior curvature + float32 interp noise
    margin = 0.35
    dev = _max_row_deviation(fields)
    n_samples = int(np.ceil(2.0 * (dev + margin))) + 2
    n_samples = max(3, n_samples)
    if n_samples > max_samples:
        return None
    half = (n_samples - 2) / 2.0

    # ---- vertical tap layout: per-(output row, source col tile) bases,
    # optionally in shift-aligned residual space (derivative-midrange
    # integer shift per source column removes the mean rotation trend)
    ncc = iystar.shape[1]
    cs = np.arange(ncc, dtype=np.float64) * step

    def _v_layout(res_rows, col_tile):
        n_col_tiles = -(-src_w // col_tile)
        base = np.zeros((out_h, n_col_tiles), dtype=np.int32)
        span_max = 0.0
        for t in range(n_col_tiles):
            c0 = t * col_tile
            c1 = min((t + 1) * col_tile, src_w)
            k0 = max(0, c0 // step - 1)
            k1 = min(ncc, -(-c1 // step) + 1)
            seg = res_rows[:, k0:k1]
            m = seg.min(axis=1)
            base[:, t] = np.floor(m - half).astype(np.int32) - 2
            span_max = max(span_max, float((seg.max(axis=1) - m).max()))
        # taps must cover the whole window [m, m+S-1] for every column of
        # the tile: tile span + S samples + float/interp safety
        return base, int(np.ceil(span_max)) + n_samples + 4

    def _best_tiling(layout_fn, res, candidates):
        best = None
        for cand in candidates:
            base, d = layout_fn(res, cand)
            eff = d * max(1.0, 96.0 / cand)
            if d <= max_taps and (best is None or eff < best[0]):
                best = (eff, cand, base, d)
        return best

    tiles_v = (512, 256, 128, 64, 32, 16)
    plain_v = _best_tiling(_v_layout, _interp_rows(iystar, out_h, step), tiles_v)

    # shifted-space candidate (skipped when the plain span is already tiny)
    dv_ = np.diff(iystar, axis=1)
    mid_slope_v = 0.5 * (dv_.max(axis=0) + dv_.min(axis=0))
    s_v_coarse = np.round(np.concatenate([[0.0], np.cumsum(mid_slope_v)]))
    s_v0 = np.round(
        np.interp(np.arange(src_w, dtype=np.float64), cs, s_v_coarse)
    ).astype(np.int64)
    s_v_full = (s_v0 - s_v0.min()).astype(np.int32)
    shifted_v = None
    if s_v_full.max() > 0 and (plain_v is None or plain_v[3] > n_samples + 8):
        s_v0_at_cs = s_v0[np.clip(cs.astype(np.int64), 0, src_w - 1)]
        res_v = iystar - (s_v0_at_cs - s_v0.min())[None, :]
        shifted_v = _best_tiling(
            _v_layout, _interp_rows(res_v, out_h, step), tiles_v
        )

    bits_v = int(s_v_full.max()).bit_length()
    # vertical taps touch (out_h, src_w)-sized streams (1 take + S
    # selects each); roll passes touch the (src_h, src_w) source once per
    # bit — weight them by the array-size ratio
    roll_w_v = src_h / max(1, out_h * (1 + n_samples))
    use_shift_v = shifted_v is not None and (
        plain_v is None or shifted_v[3] + roll_w_v * bits_v < plain_v[3]
    )
    chosen_v = shifted_v if use_shift_v else plain_v
    if chosen_v is None:
        return None
    _, col_tile, base_v, d_v = chosen_v
    s_v = s_v_full if use_shift_v else None
    if not use_shift_v:
        bits_v = 0

    # ---- horizontal tap layout: per-(row tile, output col) bases,
    # optionally shift-aligned per output row
    ncj = ix64.shape[0]
    sample_rows = np.arange(ncj) * step

    def _h_layout(res_cols, row_tile):
        n_row_tiles = -(-out_h // row_tile)
        base = np.zeros((n_row_tiles, out_w), dtype=np.int32)
        span_max_h = 0.0
        for t in range(n_row_tiles):
            r0 = t * row_tile
            r1 = min((t + 1) * row_tile, out_h)
            k0 = max(0, int(np.searchsorted(sample_rows, r0)) - 1)
            k1 = min(ncj, int(np.searchsorted(sample_rows, r1)) + 2)
            seg = res_cols[k0:k1, :]
            m = seg.min(axis=0)
            base[t, :] = np.floor(m).astype(np.int32) - 2
            span_max_h = max(span_max_h, float((seg.max(axis=0) - m).max()))
        # +1 for the right column tap, + float/interp safety
        return base, int(np.ceil(span_max_h)) + 5

    tiles_h = (512, 256, 128, 64, 32, 16)
    plain_h = _best_tiling(_h_layout, _interp_cols(ix64, out_w, step), tiles_h)

    dh_ = np.diff(ix64, axis=0)
    mid_slope_h = 0.5 * (dh_.max(axis=1) + dh_.min(axis=1))
    s_h_coarse = np.round(np.concatenate([[0.0], np.cumsum(mid_slope_h)]))
    rows_grid = np.arange(ncj, dtype=np.float64) * step
    s_h0 = np.round(
        np.interp(np.arange(out_h, dtype=np.float64), rows_grid, s_h_coarse)
    ).astype(np.int64)
    s_h_full = (s_h0 - s_h0.min()).astype(np.int32)
    shifted_h = None
    if s_h_full.max() > 0 and (plain_h is None or plain_h[3] > 10):
        s_h0_at_rows = s_h0[np.clip(rows_grid.astype(np.int64), 0, out_h - 1)]
        res_h = ix64 - (s_h0_at_rows - s_h0.min())[:, None]
        shifted_h = _best_tiling(
            _h_layout, _interp_cols(res_h, out_w, step), tiles_h
        )

    bits_h = int(s_h_full.max()).bit_length()
    # horizontal taps read S+1 (rt, out_w)-sized streams each; rolls move
    # the S (out_h, src_w) sample fields once per bit — weight by size
    roll_w_h = (n_samples * src_w) / max(1, (1 + n_samples) * out_w)
    use_shift_h = shifted_h is not None and (
        plain_h is None or shifted_h[3] + roll_w_h * bits_h < plain_h[3]
    )
    chosen_h = shifted_h if use_shift_h else plain_h
    if chosen_h is None:
        return None
    _, row_tile, base_h, d_h = chosen_h
    s_h = s_h_full if use_shift_h else None
    if not use_shift_h:
        bits_h = 0

    return ESWPlan(
        iystar_c=iystar.astype(np.float32),
        ix_c=fields_global.ix64.astype(np.float32),
        iy_c=fields_global.iy64.astype(np.float32),
        step=step,
        n_samples=n_samples,
        base_v=base_v,
        d_v=d_v,
        col_tile=col_tile,
        base_h=base_h,
        d_h=d_h,
        row_tile=row_tile,
        s_v=s_v,
        bits_v=bits_v,
        s_h=s_h,
        bits_h=bits_h,
        src_h=src_h,
        src_w=src_w,
        out_h=out_h,
        out_w=out_w,
        src_h_g=fields_global.src_h,
        src_w_g=fields_global.src_w,
        j_off=j_off,
        i_off=i_off,
    )


def make_esw_fn(
    plan: ESWPlan,
    interp_method: str = "bilinear",
    fill_value=np.nan,
    return_parts: bool = False,
):
    """Compile the exact-warp kernel (see module docstring).

    Geometry-static quantities (anchor field, clamped positions, validity)
    are materialized once on device at build time; the steady-state kernel
    runs lane-shared takes and elementwise selects only, in the same tiled
    layout as the fast SRW kernel."""
    import jax
    import jax.numpy as jnp

    if interp_method not in ("bilinear", "nearest"):
        raise ValueError("ESW supports 'bilinear' and 'nearest' only")

    p = plan
    S = p.n_samples
    half = (S - 2) / 2.0
    base_v = jnp.asarray(p.base_v)
    base_h = jnp.asarray(p.base_h)
    s_v = jnp.asarray(p.s_v) if p.s_v is not None else None
    s_h = jnp.asarray(p.s_h) if p.s_h is not None else None

    n_col_tiles = p.base_v.shape[1]
    n_row_tiles = p.base_h.shape[0]
    nearest = interp_method == "nearest"

    # shifted-space tap ids must clamp AFTER the shift is re-applied
    # (clip(rid + s) != clip(rid) + s), so the shifted paths tap an
    # edge-extended array whose index i holds clip(i + lo + shift):
    r_lo = min(0, int(p.base_v.min())) if p.s_v is not None else 0
    r_hi = (
        max(0, int(p.base_v.max()) + p.d_v - p.src_h)
        if p.s_v is not None
        else 0
    )
    ext_h = p.src_h - r_lo + r_hi
    c_lo = min(0, int(p.base_h.min())) if p.s_h is not None else 0
    c_hi = (
        max(0, int(p.base_h.max()) + p.d_h - p.src_w)
        if p.s_h is not None
        else 0
    )
    ext_w = p.src_w - c_lo + c_hi

    @jax.jit
    def precompute(iystar_f, ix_f, iy_f):
        rows = jnp.arange(p.out_h, dtype=jnp.float32)[:, None]
        cols_src = jnp.arange(p.src_w, dtype=jnp.float32)[None, :]
        # anchor field m(r, c) in window row space (float32, integer-valued)
        pos_v = _interp_field(iystar_f, rows, cols_src, p.step, jnp)
        m = jnp.floor(pos_v - half)
        # vertical selection space: anchors minus the per-column shift
        m_v = m - s_v[None, :].astype(jnp.float32) if s_v is not None else m
        # horizontal tap space: anchor VALUES at the extended shift-aligned
        # positions (index i holds m[r, clip(i + c_lo + s_h[r])])
        if s_h is not None:
            cidx = jnp.clip(
                jnp.arange(ext_w, dtype=jnp.int32)[None, :]
                + c_lo
                + s_h[:, None],
                0,
                p.src_w - 1,
            )
            m_h = jnp.take_along_axis(m, cidx, axis=1)
        else:
            m_h = m

        # positions/validity/clamps in GLOBAL source index space — the
        # float32 arithmetic is bit-identical to the gather kernel's
        cols = jnp.arange(p.out_w, dtype=jnp.float32)[None, :]
        ix_full = _interp_field(ix_f, rows, cols, p.step, jnp)
        iy_full = _interp_field(iy_f, rows, cols, p.step, jnp)
        valid = (
            (ix_full > -0.5)
            & (ix_full < p.src_w_g - 0.5)
            & (iy_full > -0.5)
            & (iy_full < p.src_h_g - 0.5)
        )
        ix_cl = jnp.clip(ix_full, 0, p.src_w_g - 1)
        iy_cl = jnp.clip(iy_full, 0, p.src_h_g - 1)
        return m_v, m_h, ix_cl, iy_cl, valid

    mv_dev, mh_dev, ixc_dev, iyc_dev, valid_dev = precompute(
        jnp.asarray(p.iystar_c), jnp.asarray(p.ix_c), jnp.asarray(p.iy_c)
    )

    @jax.jit
    def kernel(src, m_v, m_h, ixc, iyc, valid, bv, bh, sv, sh):
        src2 = src.astype(jnp.float32)
        batch = src.shape[:-2]

        # --- optional vertical shift alignment: edge-extend, then roll
        # each source column up by s_v[c] in log2 passes, so the per-tile
        # tap spans stay small under rotation
        if sv is not None:
            if r_lo or r_hi:
                parts = [src2]
                if r_lo:
                    parts.insert(
                        0, jnp.repeat(src2[..., :1, :], -r_lo, axis=-2)
                    )
                if r_hi:
                    parts.append(jnp.repeat(src2[..., -1:, :], r_hi, axis=-2))
                src2 = jnp.concatenate(parts, axis=-2)
            for b in range(p.bits_v):
                k = 1 << b
                rolled = jnp.concatenate(
                    [src2[..., k:, :], jnp.repeat(src2[..., -1:, :], k, axis=-2)],
                    axis=-2,
                )
                mask = ((sv >> b) & 1).astype(bool)[None, :]
                src2 = jnp.where(mask, rolled, src2)

        # --- vertical pass: S sample fields V_s (out_h, src_w), built per
        # source-column tile from lane-shared row takes + exact selects.
        # Tap rows are clipped to the window edge; the anchor match uses
        # the UNclipped row id, so out-of-range sample slots simply keep
        # their zero init (they are never selected by a valid pixel).
        v_tiles = [[] for _ in range(S)]
        for t in range(n_col_tiles):
            c0 = t * p.col_tile
            c1 = min((t + 1) * p.col_tile, p.src_w)
            tile_src = src2[..., c0:c1]
            m_t = m_v[:, c0:c1]  # (out_h, ct) float32 integer-valued
            base_t = bv[:, t]  # (out_h,)
            accs = [
                jnp.zeros(batch + (p.out_h, c1 - c0), jnp.float32)
                for _ in range(S)
            ]
            for d in range(p.d_v):
                idx = jnp.clip(base_t + d - r_lo, 0, ext_h - 1)
                taken = jnp.take(tile_src, idx, axis=-2)
                rid = (base_t + d).astype(jnp.float32)[:, None]
                for s in range(S):
                    accs[s] = jnp.where(m_t == rid - s, taken, accs[s])
            for s in range(S):
                v_tiles[s].append(accs[s])
        fields = [jnp.concatenate(v_tiles[s], axis=-1) for s in range(S)]

        # --- optional horizontal shift alignment of the sample fields
        # (the anchor field was pre-shifted once at build time): edge-
        # extend, then roll each output row left by s_h[r] in log2 passes
        if sh is not None:
            mask_rows = [
                ((sh >> b) & 1).astype(bool)[:, None] for b in range(p.bits_h)
            ]
            shifted = []
            for f in fields:
                if c_lo or c_hi:
                    parts = [f]
                    if c_lo:
                        parts.insert(
                            0, jnp.repeat(f[..., :, :1], -c_lo, axis=-1)
                        )
                    if c_hi:
                        parts.append(jnp.repeat(f[..., :, -1:], c_hi, axis=-1))
                    f = jnp.concatenate(parts, axis=-1)
                for b in range(p.bits_h):
                    k = 1 << b
                    rolled = jnp.concatenate(
                        [f[..., :, k:], jnp.repeat(f[..., :, -1:], k, axis=-1)],
                        axis=-1,
                    )
                    f = jnp.where(mask_rows[b], rolled, f)
                shifted.append(f)
            fields = shifted

        # --- horizontal pass: per row tile, the true vertical lerp from
        # the S samples at both column taps, routed by exact index match
        out_tiles = []
        for t in range(n_row_tiles):
            r0 = t * p.row_tile
            r1 = min((t + 1) * p.row_tile, p.out_h)
            base_t = bh[t]  # (out_w,)
            ixc_t = ixc[r0:r1, :]
            iyc_t = iyc[r0:r1, :]
            m_rows = m_h[r0:r1, :]  # (rt, src_w)
            f_rows = [f[..., r0:r1, :] for f in fields]

            # window offset, tap base and shift are removed in integer
            # space AFTER floor/rint (float subtraction before rounding
            # could flip ties relative to the gather kernel)
            if nearest:
                y0g = jnp.rint(iyc_t)
                i0 = jnp.rint(ixc_t).astype(jnp.int32) - p.i_off
            else:
                y0f = jnp.floor(iyc_t)
                fy = iyc_t - y0f
                y0g = y0f
                x0 = jnp.floor(ixc_t)
                fx = ixc_t - x0
                i0 = x0.astype(jnp.int32) - p.i_off
            if sh is not None:
                i0 = i0 - sh[r0:r1][:, None]
            y0w = y0g - p.j_off  # window row, float32 integer-valued

            zero = jnp.zeros(batch + (r1 - r0, p.out_w), jnp.float32)
            cv0 = zero
            cv1 = zero
            for d in range(p.d_h):
                idx = jnp.clip(base_t + d - c_lo, 0, ext_w - 1)
                mg = jnp.take(m_rows, idx, axis=-1)  # (rt, out_w)
                # s0 = y0 - m selects the lerp's lower sample; for nearest
                # rint may land on the window's top row S-1
                s0 = jnp.clip(y0w - mg, 0, S - 1 if nearest else S - 2)
                taken = [jnp.take(f, idx, axis=-1) for f in f_rows]
                a = taken[0]
                bb = taken[1]
                for s in range(1, S):
                    a = jnp.where(s0 >= s - 0.5, taken[s], a)
                    if s >= 2:
                        bb = jnp.where(s0 >= s - 1.5, taken[s], bb)
                colval = a if nearest else a + fy * (bb - a)
                cond0 = i0 == base_t + d
                cv0 = jnp.where(cond0, colval, cv0)
                if not nearest:
                    cv1 = jnp.where(i0 + 1 == base_t + d, colval, cv1)
            out_tiles.append(cv0 if nearest else cv0 + fx * (cv1 - cv0))
        out = jnp.concatenate(out_tiles, axis=-2)

        fill = jnp.asarray(fill_value, dtype=out.dtype)
        return jnp.where(valid, out, fill)

    statics = (
        mv_dev, mh_dev, ixc_dev, iyc_dev, valid_dev, base_v, base_h, s_v, s_h,
    )

    if return_parts:
        # for mosaic composition: the caller passes the statics as jit
        # ARGUMENTS (closing over them inside an outer jit would embed
        # them as program constants — hundreds of MB for big pieces)
        return kernel, statics

    def fn(src):
        return kernel(src, *statics)

    return fn


def make_esw_reproject_fn(
    source_gm: GridMapping,
    target_gm: GridMapping,
    interp_method: str = "bilinear",
    fill_value=np.nan,
    step: int = 16,
    **plan_kwargs,
):
    """Plan + compile the exact-warp kernel with source-window cropping,
    or None when the mapping is unsuitable (callers fall back to the
    region mosaic or the XLA-gather kernel).  The plan keeps the GLOBAL
    coordinate fields, so cropping does not change a single output bit."""
    from .srw import _source_window_gm

    if interp_method not in ("bilinear", "nearest"):
        return None
    fields = _coarse_geometry(source_gm, target_gm, step)
    if fields is None:
        return None
    win = None
    f_plan = fields
    w = _source_window_gm(source_gm, fields, margin=8 + 48)
    if w is not None:
        _, win = w
        f_plan = _offset_fields(fields, *win)
    plan = plan_esw(
        source_gm,
        target_gm,
        step=step,
        fields=f_plan,
        fields_global=fields,
        win=win,
        **plan_kwargs,
    )
    if plan is None:
        return None
    inner = make_esw_fn(plan, interp_method, fill_value)
    if win is None:
        return inner
    j0, j1, i0, i1 = win

    def fn(src):
        return inner(src[..., j0:j1, i0:i1])

    return fn


def _slice_raw(ix64, iy64, step, r0, r1, c0, c1):
    """Slice the whole-target raw coarse fields to the target sub-window
    [r0:r1) x [c0:c1) (r0/c0 step-aligned by construction of the quadtree):
    the slice keeps the parent's float64 values bit-for-bit, so every piece
    sees exactly the coordinate field the whole-target gather kernel sees."""
    jr0, ji0 = r0 // step, c0 // step
    njr = (r1 - r0 - 1) // step + 2
    nji = (c1 - c0 - 1) // step + 2
    return (
        ix64[jr0 : jr0 + njr, ji0 : ji0 + nji],
        iy64[jr0 : jr0 + njr, ji0 : ji0 + nji],
    )


def _offset_fields(fields: _Fields, j0: int, j1: int, i0: int, i1: int):
    """Re-express coarse fields relative to the source window
    [j0:j1) x [i0:i1); j0 and i0 must be aligned to the coarse step (as
    produced by _source_window_gm)."""
    step = fields.step
    k0 = i0 // step
    ncc = (i1 - i0 - 1) // step + 2
    return _Fields(
        fields.ix64 - i0,
        fields.iy64 - j0,
        fields.iystar64[:, k0 : k0 + ncc] - j0,
        step,
        j1 - j0,
        i1 - i0,
        fields.out_h,
        fields.out_w,
    )


def make_esw_region_fn(
    source_gm: GridMapping,
    target_gm: GridMapping,
    interp_method: str = "bilinear",
    fill_value=np.nan,
    step: int = 16,
    base_split: int = 2,
    max_depth: int = 4,
    **plan_kwargs,
):
    """Exact reprojection for domain-scale warps no single ESW plan covers
    (e.g. a projection singularity inside the target): quadtree-split the
    target, plan each region's exact-warp kernel against its own cropped
    source window, and fall back to the XLA gather kernel only for regions
    that still refuse to plan.

    Region coarse fields are float64 slices of the whole-target fields
    (computed once), so the quadtree descent costs no new transform
    evaluations AND every piece — planned or gather-fallback — computes
    positions from the exact same float32 coarse nodes as the whole-target
    gather kernel: the mosaic is bit-seamless by construction.

    Returns ``fn(src) -> target`` or None when nothing plans (callers use
    plain gather) or the interpolation method is unsupported.

    Replaces the reference's uniformized-window tile mosaic
    (reference reproject.py:385-469) with per-region planned kernels.
    """
    from .reproject_ops import make_gather_piece_fn
    from .srw import _iystar_from_fields, _raw_coarse_fields, _source_window_gm

    if interp_method not in ("bilinear", "nearest"):
        return None

    out_h, out_w = target_gm.height, target_gm.width
    src_h_g, src_w_g = source_gm.height, source_gm.width
    ix_r, iy_r = _raw_coarse_fields(source_gm, target_gm, step)

    pieces = []  # (r0, r1, c0, c1, window or None, kernel, statics)
    n_planned = 0

    def build(r0, r1, c0, c1, depth):
        nonlocal n_planned
        ixs, iys = _slice_raw(ix_r, iy_r, step, r0, r1, c0, c1)
        finite = np.isfinite(ixs) & np.isfinite(iys)
        plan = None
        win = None
        if finite.all():
            iystar_s = _iystar_from_fields(ixs, iys, src_w_g, step)
            if iystar_s is not None:
                f = _Fields(
                    ixs, iys, iystar_s, step, src_h_g, src_w_g,
                    r1 - r0, c1 - c0,
                )
                f_plan = f
                w = _source_window_gm(source_gm, f, margin=8 + 48)
                if w is not None:
                    _, win = w
                    f_plan = _offset_fields(f, *win)
                plan = plan_esw(
                    source_gm,
                    target_gm,
                    step=step,
                    fields=f_plan,
                    fields_global=f,
                    win=win,
                    **plan_kwargs,
                )
        if plan is not None:
            kernel, statics = make_esw_fn(
                plan, interp_method, fill_value, return_parts=True
            )
            n_planned += 1
            pieces.append((r0, r1, c0, c1, win, kernel, statics))
            return
        half_r = (r1 - r0) // 2 // step * step
        half_c = (c1 - c0) // 2 // step * step
        if depth < max_depth and half_r >= 128 and half_c >= 128:
            rm, cm = r0 + half_r, c0 + half_c
            build(r0, rm, c0, cm, depth + 1)
            build(r0, rm, cm, c1, depth + 1)
            build(rm, r1, c0, cm, depth + 1)
            build(rm, r1, cm, c1, depth + 1)
            return
        if not finite.any():
            # every coarse node is outside the transform's domain: the
            # whole-target gather yields fill here, which the mosaic
            # buffer already holds
            return
        win = None
        fr = _Fields(ixs, iys, None, step, src_h_g, src_w_g, r1 - r0, c1 - c0)
        w = _source_window_gm(source_gm, fr, margin=8)
        if w is not None:
            _, win = w
        j_off, i_off = (win[0], win[2]) if win is not None else (0, 0)
        kernel, statics = make_gather_piece_fn(
            ixs.astype(np.float32),
            iys.astype(np.float32),
            step,
            r1 - r0,
            c1 - c0,
            src_h_g,
            src_w_g,
            j_off,
            i_off,
            interp_method,
            fill_value,
            return_parts=True,
        )
        pieces.append((r0, r1, c0, c1, win, kernel, statics))

    rb = (-(-out_h // base_split) + step - 1) // step * step
    cb = (-(-out_w // base_split) + step - 1) // step * step
    for bj in range(base_split):
        for bi in range(base_split):
            r0, r1 = bj * rb, min((bj + 1) * rb, out_h)
            c0, c1 = bi * cb, min((bi + 1) * cb, out_w)
            if r1 > r0 and c1 > c0:
                build(r0, r1, c0, c1, 0)

    if n_planned == 0:
        return None

    import jax
    import jax.numpy as jnp

    # one jitted dispatch for the whole mosaic (per-piece eager calls would
    # each pay a host->device round trip); every piece's static fields are
    # passed as ARGUMENTS so the traced program stays small
    flat_statics = []
    specs = []
    for r0, r1, c0, c1, win, piece_fn, statics in pieces:
        specs.append((r0, r1, c0, c1, win, piece_fn, len(flat_statics), len(statics)))
        flat_statics.extend(statics)

    @jax.jit
    def mosaic(src, *flat):
        src = jnp.asarray(src)
        out = jnp.full(
            src.shape[:-2] + (out_h, out_w),
            jnp.float32(fill_value),
            dtype=jnp.float32,
        )
        for r0, r1, c0, c1, win, piece_fn, k, n in specs:
            piece_src = (
                src[..., win[0] : win[1], win[2] : win[3]]
                if win is not None
                else src
            )
            out = out.at[..., r0:r1, c0:c1].set(
                piece_fn(piece_src, *flat[k : k + n])
            )
        return out

    def fn(src):
        return mosaic(src, *flat_statics)

    return fn
