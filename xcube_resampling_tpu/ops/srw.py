"""Separable-residual warp (SRW): gather-free reprojection at HBM speed.

XLA lowers general 2D gathers on TPU to near-serial loads (~20 Mpix/s
measured on v5e) while contiguous row-takes, lane-shared column-takes,
rolls, selects and FMAs all stream at memory bandwidth.  SRW reformulates
smooth-warp resampling (reprojection, affine) to use only those primitives:

* **Two-pass decomposition** (Catmull & Smith 1980 style): vertical pass
  ``v[j, c] = src(iy*(j, c), c)`` onto the (output-row, source-column)
  grid, then horizontal pass ``out[j, i] = v(j, ix(j, i))``.  The
  reparametrized row field ``iy*(j, c) = iy(j, ix^{-1}(j, ·)(c))`` is
  computed on the host from the float64 coarse coordinate field (the
  inverse exists wherever ``ix`` is monotone along rows — true for regular
  CRS pairs away from projection folds; the planner verifies this and
  callers fall back to the XLA-gather kernel otherwise).
* **Tile-banded taps**: within a column tile, ``iy*`` varies by only a few
  pixels around a per-output-row integer base, so the vertical resample is
  a short sum of hat-weighted whole-row takes; symmetrically the
  horizontal resample is a short sum of lane-shared column takes.  Tap
  counts are static, computed by the host planner from the actual field.

Cost: ~(D_v + D_h) full-array streams — tens of ms for a 4k x 4k target on
v5e, ~50x faster than the XLA gather formulation.  Supports "bilinear" and
"nearest" (triangular falls back to the gather kernel).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..crs import Transformer
from ..gridmapping import GridMapping


@dataclass
class SRWPlan:
    """Host-side plan: coarse fields, integer bases and tap counts."""

    # vertical pass
    iystar_c: np.ndarray  # coarse (nrj, ncc) float32: row position per (out row, src col)
    step_vr: int
    step_vc: int
    base_v: np.ndarray  # (out_h, n_col_tiles) int32
    d_v: int
    col_tile: int
    # horizontal pass
    ix_c: np.ndarray  # coarse (nrj, nci) float32: col position per (out row, out col)
    iy_c: np.ndarray  # coarse (nrj, nci) float32 (for the validity mask)
    step: int
    base_h: np.ndarray  # (n_row_tiles, out_w) int32
    d_h: int
    row_tile: int
    # geometry
    src_h: int
    src_w: int
    out_h: int
    out_w: int


def plan_srw(
    source_gm: GridMapping,
    target_gm: GridMapping,
    step: int = 16,
    col_tile: int | None = None,
    row_tile: int | None = None,
    max_taps: int = 48,
    tap_budget: int = 12,
) -> SRWPlan | None:
    """Build the SRW plan, or return None when the mapping is unsuitable
    (non-monotone rows, excessive rotation/shear for any usable tile size).

    When *col_tile*/*row_tile* are None they are auto-sized from the
    coordinate field's slopes so each pass needs about *tap_budget* taps."""
    transformer = Transformer.from_crs(target_gm.crs, source_gm.crs)

    out_h, out_w = target_gm.height, target_gm.width
    src_h, src_w = source_gm.height, source_gm.width

    ncj = (out_h - 1) // step + 2
    nci = (out_w - 1) // step + 2

    tgt_x = np.asarray(target_gm.x_coords.data, dtype=np.float64)
    tgt_y = np.asarray(target_gm.y_coords.data, dtype=np.float64)
    tgt_x0, tgt_dx = float(tgt_x[0]), float(tgt_x[1] - tgt_x[0])
    tgt_y0, tgt_dy = float(tgt_y[0]), float(tgt_y[1] - tgt_y[0])
    xs = tgt_x0 + tgt_dx * (np.arange(nci, dtype=np.float64) * step)
    ys = tgt_y0 + tgt_dy * (np.arange(ncj, dtype=np.float64) * step)
    xx, yy = np.meshgrid(xs, ys)
    sx, sy = transformer.transform(xx, yy)

    src_x0 = float(np.asarray(source_gm.x_coords.data)[0])
    y_vals = np.asarray(source_gm.y_coords.data)
    src_y0 = float(y_vals[0])
    src_yres_signed = float(y_vals[1] - y_vals[0])
    ix64 = (np.asarray(sx) - src_x0) / float(source_gm.x_res)
    iy64 = (np.asarray(sy) - src_y0) / src_yres_signed

    if not np.isfinite(ix64).all() or not np.isfinite(iy64).all():
        return None

    # monotonicity of ix along output rows (required for reparametrization)
    dx_row = np.diff(ix64, axis=1)
    if np.all(dx_row > 0):
        ascending = True
    elif np.all(dx_row < 0):
        ascending = False
    else:
        return None

    # --- vertical pass field: iy*(out_row, src_col) via per-row inversion
    step_vc = max(1, (src_w - 1) // max(1, (src_w - 1) // step))
    ncc = (src_w - 1) // step + 2
    cs = (np.arange(ncc, dtype=np.float64) * step).clip(max=src_w - 1 + step)
    iystar = np.empty((ncj, ncc), dtype=np.float64)
    for r in range(ncj):
        xp_row = ix64[r] if ascending else ix64[r, ::-1]
        fp_row = iy64[r] if ascending else iy64[r, ::-1]
        vals = np.interp(cs, xp_row, fp_row)
        # np.interp clamps flat outside [xp_row[0], xp_row[-1]]; linearly
        # extrapolate instead so edge taps see consistent positions
        left = cs < xp_row[0]
        if left.any():
            slope = (fp_row[1] - fp_row[0]) / (xp_row[1] - xp_row[0])
            vals[left] = fp_row[0] + (cs[left] - xp_row[0]) * slope
        right = cs > xp_row[-1]
        if right.any():
            slope = (fp_row[-1] - fp_row[-2]) / (xp_row[-1] - xp_row[-2])
            vals[right] = fp_row[-1] + (cs[right] - xp_row[-1]) * slope
        iystar[r] = vals

    # auto tile sizing from the field slopes: within-tile position span
    # ~ slope * tile, so tile ~ tap_budget / slope
    if col_tile is None:
        slope_v = float(
            np.nanmax(np.abs(np.diff(iystar, axis=1))) / step
        )
        col_tile = _pick_tile(slope_v, tap_budget)
    if row_tile is None:
        slope_h = float(np.nanmax(np.abs(np.diff(ix64, axis=0))) / step)
        row_tile = _pick_tile(slope_h, tap_budget)

    # per-(full out row, col tile) integer base + static tap count
    n_col_tiles = -(-src_w // col_tile)
    rows_full = np.arange(out_h, dtype=np.float64) / step
    jr0 = np.clip(rows_full.astype(np.int64), 0, ncj - 2)
    frr = rows_full - jr0
    # interpolate iystar to every output row (linear in rows, like device)
    iystar_rows = (
        iystar[jr0, :] * (1 - frr[:, None]) + iystar[jr0 + 1, :] * frr[:, None]
    )  # (out_h, ncc)
    base_v = np.zeros((out_h, n_col_tiles), dtype=np.int32)
    span_max = 0.0
    for t in range(n_col_tiles):
        c0 = t * col_tile
        c1 = min((t + 1) * col_tile, src_w)
        k0 = max(0, c0 // step - 1)
        k1 = min(ncc, -(-c1 // step) + 1)
        seg = iystar_rows[:, k0:k1]
        m = seg.min(axis=1)
        mx = seg.max(axis=1)
        base_v[:, t] = np.floor(m).astype(np.int32) - 1
        span_max = max(span_max, float((mx - m).max()))
    d_v = int(np.ceil(span_max)) + 4
    if d_v > max_taps:
        return None

    # --- horizontal pass: per-(row tile, out col) integer base
    n_row_tiles = -(-out_h // row_tile)
    cols_full = np.arange(out_w, dtype=np.float64) / step
    ic0 = np.clip(cols_full.astype(np.int64), 0, nci - 2)
    fcc = cols_full - ic0
    ix_cols = (
        ix64[:, ic0] * (1 - fcc[None, :]) + ix64[:, ic0 + 1] * fcc[None, :]
    )  # (ncj, out_w)
    base_h = np.zeros((n_row_tiles, out_w), dtype=np.int32)
    span_max_h = 0.0
    sample_rows = np.arange(ncj) * step
    for t in range(n_row_tiles):
        r0 = t * row_tile
        r1 = min((t + 1) * row_tile, out_h)
        k0 = max(0, int(np.searchsorted(sample_rows, r0)) - 1)
        k1 = min(ncj, int(np.searchsorted(sample_rows, r1)) + 2)
        seg = ix_cols[k0:k1, :]
        m = seg.min(axis=0)
        mx = seg.max(axis=0)
        base_h[t, :] = np.floor(m).astype(np.int32) - 1
        span_max_h = max(span_max_h, float((mx - m).max()))
    d_h = int(np.ceil(span_max_h)) + 4
    if d_h > max_taps:
        return None

    return SRWPlan(
        iystar_c=iystar.astype(np.float32),
        step_vr=step,
        step_vc=step,
        base_v=base_v,
        d_v=d_v,
        col_tile=col_tile,
        ix_c=ix64.astype(np.float32),
        iy_c=iy64.astype(np.float32),
        step=step,
        base_h=base_h,
        d_h=d_h,
        row_tile=row_tile,
        src_h=src_h,
        src_w=src_w,
        out_h=out_h,
        out_w=out_w,
    )


def _pick_tile(slope: float, tap_budget: int) -> int:
    """Largest power-of-two tile in [64, 1024] whose in-tile span stays
    around *tap_budget* positions."""
    if not np.isfinite(slope) or slope <= 0:
        return 1024
    tile = tap_budget / slope
    for cand in (1024, 512, 256, 128, 64):
        if tile >= cand:
            return cand
    return 64


def make_srw_fn(plan: SRWPlan, interp_method: str = "bilinear", fill_value=np.nan):
    """Compile the SRW kernel: fn(src[..., src_h, src_w]) -> (..., out_h, out_w)."""
    import jax
    import jax.numpy as jnp

    if interp_method not in ("bilinear", "nearest"):
        raise ValueError("SRW supports 'bilinear' and 'nearest' only")

    p = plan
    iystar_c = jnp.asarray(p.iystar_c)
    ix_c = jnp.asarray(p.ix_c)
    iy_c = jnp.asarray(p.iy_c)
    base_v = jnp.asarray(p.base_v)
    base_h = jnp.asarray(p.base_h)

    from .reproject_ops import _interp_field

    n_col_tiles = p.base_v.shape[1]
    n_row_tiles = p.base_h.shape[0]

    def weight(pos, k):
        if interp_method == "bilinear":
            return jnp.maximum(0.0, 1.0 - jnp.abs(pos - k))
        return (jnp.round(pos) == k).astype(jnp.float32)

    @jax.jit
    def kernel(src, iystar_f, ix_f, iy_f, bv, bh):
        # ---------- vertical pass: (out_h, src_w) ----------
        rows = jnp.arange(p.out_h, dtype=jnp.float32)[:, None]
        v_tiles = []
        for t in range(n_col_tiles):
            c0 = t * p.col_tile
            c1 = min((t + 1) * p.col_tile, p.src_w)
            cols_src = jnp.arange(c0, c1, dtype=jnp.float32)[None, :]
            pos = _interp_field(iystar_f, rows, cols_src, p.step, jnp)
            base_t = bv[:, t]
            tile_src = src[..., c0:c1]
            acc = jnp.zeros(
                src.shape[:-2] + (p.out_h, c1 - c0), dtype=jnp.float32
            )
            for d in range(p.d_v):
                idx = jnp.clip(base_t + d, 0, p.src_h - 1)
                w = weight(pos, (base_t + d)[:, None].astype(jnp.float32))
                acc = acc + w * jnp.take(tile_src, idx, axis=-2)
            v_tiles.append(acc)
        v = jnp.concatenate(v_tiles, axis=-1)  # (..., out_h, src_w)

        # ---------- horizontal pass: (out_h, out_w) ----------
        cols = jnp.arange(p.out_w, dtype=jnp.float32)[None, :]
        out_tiles = []
        for t in range(n_row_tiles):
            r0 = t * p.row_tile
            r1 = min((t + 1) * p.row_tile, p.out_h)
            rows_t = jnp.arange(r0, r1, dtype=jnp.float32)[:, None]
            pos = _interp_field(ix_f, rows_t, cols, p.step, jnp)
            base_t = bh[t]
            tile_v = v[..., r0:r1, :]
            acc = jnp.zeros(
                src.shape[:-2] + (r1 - r0, p.out_w), dtype=jnp.float32
            )
            for d in range(p.d_h):
                idx = jnp.clip(base_t + d, 0, p.src_w - 1)
                w = weight(pos, (base_t + d)[None, :].astype(jnp.float32))
                acc = acc + w * jnp.take(tile_v, idx, axis=-1)
            out_tiles.append(acc)
        out = jnp.concatenate(out_tiles, axis=-2)

        # ---------- validity mask + fill ----------
        rows_all = jnp.arange(p.out_h, dtype=jnp.float32)[:, None]
        ix_full = _interp_field(ix_f, rows_all, cols, p.step, jnp)
        iy_full = _interp_field(iy_f, rows_all, cols, p.step, jnp)
        valid = (
            (ix_full > -0.5)
            & (ix_full < p.src_w - 0.5)
            & (iy_full > -0.5)
            & (iy_full < p.src_h - 0.5)
        )
        fill = jnp.asarray(fill_value, dtype=out.dtype)
        return jnp.where(valid, out, fill)

    def fn(src):
        return kernel(src, iystar_c, ix_c, iy_c, base_v, base_h)

    return fn


def make_srw_reproject_fn(
    source_gm: GridMapping,
    target_gm: GridMapping,
    interp_method: str = "bilinear",
    fill_value=np.nan,
    **plan_kwargs,
):
    """Plan + compile, or None when the mapping is unsuitable for SRW."""
    if interp_method not in ("bilinear", "nearest"):
        return None
    plan = plan_srw(source_gm, target_gm, **plan_kwargs)
    if plan is None:
        return None
    return make_srw_fn(plan, interp_method, fill_value)
