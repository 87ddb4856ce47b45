"""Fused on-device reprojection kernel.

The reference's reprojection is host-staged: pyproj C calls per dask block,
then a numpy gather (reference reproject.py:472-496, 268-335).  Here the
device kernel is a single fused XLA computation.  Two coordinate strategies:

* ``exact=True`` — evaluate the native projection pipeline per pixel on
  device.  Only valid with float64 (TPU f64 is slow); used for validation.
* default (approximate-field) — evaluate the inverse transform on a coarse
  grid (every ``step``-th target pixel) on the host in float64, convert to
  *fractional source indices* (bounded magnitudes, float32-safe), and let
  the device bilinearly interpolate the coarse index field and gather.
  Curvature error over a 16-pixel cell is far below 1e-2 px for real CRS
  pairs, while naive float32 evaluation of geodetic formulas loses ~100 m
  to cancellation.  This is also faster: the per-pixel cost is a handful of
  FMAs + one gather — HBM-bandwidth bound, the speed-of-light regime for
  this op (and the strategy production warpers use).

This is the headline-benchmark kernel (BASELINE config #3).
"""

from __future__ import annotations

import numpy as np

from ..crs import Transformer
from ..gridmapping import GridMapping


def coarse_coord_field(
    source_gm: GridMapping,
    target_gm: GridMapping,
    step: int = 16,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side float64 evaluation of the inverse coordinate transform on
    every ``step``-th target pixel, returned as float32 fractional source
    index fields (ix, iy) of shape (ceil((h-1)/step)+1, ceil((w-1)/step)+1).
    """
    transformer = Transformer.from_crs(target_gm.crs, source_gm.crs)

    out_h, out_w = target_gm.height, target_gm.width
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

    ix = (np.asarray(sx) - src_x0) / float(source_gm.x_res)
    iy = (np.asarray(sy) - src_y0) / src_yres_signed
    return ix.astype(np.float32), iy.astype(np.float32), step


def _interp_field(field, rows, cols, step, xp):
    """Bilinear interpolation of a coarse (ncj, nci) field at fractional
    cell coordinates given by target pixel rows/cols (broadcastable).

    When rows is (H, 1) and cols is (1, W) — the common case — the gather
    factorizes into a row-take followed by a lane-shared column-take, which
    stream at memory bandwidth on TPU (a fused 2D gather would serialize).
    """
    inv = 1.0 / step
    cj = rows * inv
    ci = cols * inv
    j0 = xp.floor(cj).astype(xp.int32)
    i0 = xp.floor(ci).astype(xp.int32)
    fj = cj - j0
    fi = ci - i0
    j0 = xp.clip(j0, 0, field.shape[0] - 2)
    i0 = xp.clip(i0, 0, field.shape[1] - 2)

    separable = (
        getattr(rows, "ndim", 0) == 2
        and getattr(cols, "ndim", 0) == 2
        and rows.shape[1] == 1
        and cols.shape[0] == 1
    )
    if separable and xp is not np:
        jr = j0[:, 0]
        ic = i0[0, :]
        r0 = xp.take(field, jr, axis=0)
        r1 = xp.take(field, jr + 1, axis=0)
        f00 = xp.take(r0, ic, axis=1)
        f01 = xp.take(r0, ic + 1, axis=1)
        f10 = xp.take(r1, ic, axis=1)
        f11 = xp.take(r1, ic + 1, axis=1)
    else:
        f00 = field[j0, i0]
        f01 = field[j0, i0 + 1]
        f10 = field[j0 + 1, i0]
        f11 = field[j0 + 1, i0 + 1]
    f0 = f00 + fi * (f01 - f00)
    f1 = f10 + fi * (f11 - f10)
    return f0 + fj * (f1 - f0)


def gather_interp(src, ix, iy, interp_method, fill_value, xp, valid=None):
    """Bounds-masked gather + interpolation at fractional source indices
    (shared by the fused single-chip and sharded halo-exchange kernels).
    Coordinates are clamped to the array extent before the taps are taken
    (clamp-to-edge), so halo-extended and plain arrays give identical
    results over the valid domain."""
    src_h, src_w = src.shape[-2], src.shape[-1]
    if valid is None:
        valid = (
            (ix > -0.5) & (ix < src_w - 0.5) & (iy > -0.5) & (iy < src_h - 0.5)
        )
    ix = xp.clip(ix, 0, src_w - 1)
    iy = xp.clip(iy, 0, src_h - 1)
    if interp_method == "nearest":
        jx = xp.rint(ix).astype(xp.int32)
        jy = xp.rint(iy).astype(xp.int32)
        vals = src[..., jy, jx]
    else:
        x0f = xp.floor(ix)
        y0f = xp.floor(iy)
        fx = ix - x0f
        fy = iy - y0f
        x0 = x0f.astype(xp.int32)
        y0 = y0f.astype(xp.int32)
        x1 = xp.clip(x0 + 1, 0, src_w - 1)
        y1 = xp.clip(y0 + 1, 0, src_h - 1)
        v00 = src[..., y0, x0]
        v01 = src[..., y0, x1]
        v10 = src[..., y1, x0]
        v11 = src[..., y1, x1]
        if interp_method == "triangular":
            near = v00 + fx * (v01 - v00) + fy * (v10 - v00)
            far = v11 + (1.0 - fx) * (v10 - v11) + (1.0 - fy) * (v01 - v11)
            vals = xp.where(fx + fy < 1.0, near, far)
        else:
            vu0 = v00 + fx * (v01 - v00)
            vu1 = v10 + fx * (v11 - v10)
            vals = vu0 + fy * (vu1 - vu0)
    fill = xp.asarray(fill_value, dtype=vals.dtype)
    return xp.where(valid, vals, fill)


def make_fused_reproject_fn(
    source_gm: GridMapping,
    target_gm: GridMapping,
    interp_method: str = "bilinear",
    fill_value: float = np.nan,
    step: int = 16,
):
    """Build a jit-compiled ``fn(src_data) -> target_data`` closure using
    the approximate coordinate-field strategy (see module docstring)."""
    import jax
    import jax.numpy as jnp

    ix_c_np, iy_c_np, step = coarse_coord_field(source_gm, target_gm, step)
    # The coarse fields are passed as call arguments, not captured
    # constants: embedded host constants force per-call re-staging on some
    # backends (measured 5 orders of magnitude slower on the remote TPU).
    ix_c = jnp.asarray(ix_c_np)
    iy_c = jnp.asarray(iy_c_np)
    out_h, out_w = target_gm.height, target_gm.width

    @jax.jit
    def kernel(src, ix_field, iy_field):
        rows = jnp.arange(out_h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(out_w, dtype=jnp.float32)[None, :]
        ix = _interp_field(ix_field, rows, cols, step, jnp)
        iy = _interp_field(iy_field, rows, cols, step, jnp)
        return gather_interp(src, ix, iy, interp_method, fill_value, jnp)

    def fn(src):
        return kernel(src, ix_c, iy_c)

    return fn


def make_gather_piece_fn(
    ix_c_np: np.ndarray,
    iy_c_np: np.ndarray,
    step: int,
    out_h: int,
    out_w: int,
    src_h_g: int,
    src_w_g: int,
    j_off: int = 0,
    i_off: int = 0,
    interp_method: str = "bilinear",
    fill_value: float = np.nan,
    return_parts: bool = False,
):
    """Gather kernel for one mosaic piece, driven by GLOBAL-valued float32
    coarse index fields over a cropped source window.

    Positions, floors, clamps and the validity mask are computed in global
    source index space — bit-identical to ``make_fused_reproject_fn`` run
    on the whole source — and the integer window offset is subtracted only
    AFTER floor/rint (a float subtraction before rounding could flip ties).
    With ``return_parts=True`` returns ``(kernel, (ix_c, iy_c))`` for use
    inside an outer jit (fields passed as arguments, not baked constants).
    """
    import jax
    import jax.numpy as jnp

    ix_c = jnp.asarray(ix_c_np)
    iy_c = jnp.asarray(iy_c_np)
    nearest = interp_method == "nearest"

    @jax.jit
    def kernel(src, ix_field, iy_field):
        rows = jnp.arange(out_h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(out_w, dtype=jnp.float32)[None, :]
        ix = _interp_field(ix_field, rows, cols, step, jnp)
        iy = _interp_field(iy_field, rows, cols, step, jnp)
        valid = (
            (ix > -0.5) & (ix < src_w_g - 0.5) & (iy > -0.5) & (iy < src_h_g - 0.5)
        )
        ix = jnp.clip(ix, 0, src_w_g - 1)
        iy = jnp.clip(iy, 0, src_h_g - 1)
        if nearest:
            jx = jnp.rint(ix).astype(jnp.int32) - i_off
            jy = jnp.rint(iy).astype(jnp.int32) - j_off
            vals = src[..., jy, jx]
        else:
            x0f = jnp.floor(ix)
            y0f = jnp.floor(iy)
            fx = ix - x0f
            fy = iy - y0f
            x0g = x0f.astype(jnp.int32)
            y0g = y0f.astype(jnp.int32)
            x1 = jnp.clip(x0g + 1, 0, src_w_g - 1) - i_off
            y1 = jnp.clip(y0g + 1, 0, src_h_g - 1) - j_off
            x0 = x0g - i_off
            y0 = y0g - j_off
            v00 = src[..., y0, x0]
            v01 = src[..., y0, x1]
            v10 = src[..., y1, x0]
            v11 = src[..., y1, x1]
            if interp_method == "triangular":
                near = v00 + fx * (v01 - v00) + fy * (v10 - v00)
                far = v11 + (1.0 - fx) * (v10 - v11) + (1.0 - fy) * (v01 - v11)
                vals = jnp.where(fx + fy < 1.0, near, far)
            else:
                vu0 = v00 + fx * (v01 - v00)
                vu1 = v10 + fx * (v11 - v10)
                vals = vu0 + fy * (vu1 - vu0)
        fill = jnp.asarray(fill_value, dtype=vals.dtype)
        return jnp.where(valid, vals, fill)

    if return_parts:
        return kernel, (ix_c, iy_c)

    def fn(src):
        return kernel(src, ix_c, iy_c)

    return fn


def make_gather_piece_kernel_dyn(
    step: int,
    out_h: int,
    out_w: int,
    src_h_g: int,
    src_w_g: int,
    interp_method: str = "bilinear",
    fill_value: float = np.nan,
):
    """Offset-as-argument variant of :func:`make_gather_piece_fn`: the
    window origin ``(j_off, i_off)`` is a traced int32 pair instead of a
    baked Python constant, so same-shaped mosaic pieces share ONE
    compiled kernel and run as one vmapped dispatch (window slicing via
    per-piece ``dynamic_slice`` happens in the caller).  Same global-
    index-space arithmetic — bit-identical results."""
    import jax.numpy as jnp

    nearest = interp_method == "nearest"

    def kernel(src, ix_field, iy_field, j_off, i_off):
        rows = jnp.arange(out_h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(out_w, dtype=jnp.float32)[None, :]
        ix = _interp_field(ix_field, rows, cols, step, jnp)
        iy = _interp_field(iy_field, rows, cols, step, jnp)
        valid = (
            (ix > -0.5) & (ix < src_w_g - 0.5)
            & (iy > -0.5) & (iy < src_h_g - 0.5)
        )
        ix = jnp.clip(ix, 0, src_w_g - 1)
        iy = jnp.clip(iy, 0, src_h_g - 1)
        if nearest:
            jx = jnp.rint(ix).astype(jnp.int32) - i_off
            jy = jnp.rint(iy).astype(jnp.int32) - j_off
            vals = src[..., jy, jx]
        else:
            x0f = jnp.floor(ix)
            y0f = jnp.floor(iy)
            fx = ix - x0f
            fy = iy - y0f
            x0g = x0f.astype(jnp.int32)
            y0g = y0f.astype(jnp.int32)
            x1 = jnp.clip(x0g + 1, 0, src_w_g - 1) - i_off
            y1 = jnp.clip(y0g + 1, 0, src_h_g - 1) - j_off
            x0 = x0g - i_off
            y0 = y0g - j_off
            v00 = src[..., y0, x0]
            v01 = src[..., y0, x1]
            v10 = src[..., y1, x0]
            v11 = src[..., y1, x1]
            if interp_method == "triangular":
                near = v00 + fx * (v01 - v00) + fy * (v10 - v00)
                far = v11 + (1.0 - fx) * (v10 - v11) + (1.0 - fy) * (v01 - v11)
                vals = jnp.where(fx + fy < 1.0, near, far)
            else:
                vu0 = v00 + fx * (v01 - v00)
                vu1 = v10 + fx * (v11 - v10)
                vals = vu0 + fy * (vu1 - vu0)
        fill = jnp.asarray(fill_value, dtype=vals.dtype)
        return jnp.where(valid, vals, fill)

    return kernel
