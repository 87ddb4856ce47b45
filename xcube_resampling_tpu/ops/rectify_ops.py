"""Rectification kernels: inverse source-pixel lookup over irregular swaths.

This replaces the reference's numba scatter loops
(/root/reference/xcube_resampling/rectify.py:424-576), which are hostile to
SIMT/TPU execution (sequential first-writer-wins writes).  The redesign:

* Every source quad (2x2 cell of the swath coordinate images) claims a
  bounded rectangle of target pixels (after the pre-downscale step a quad
  covers only a few pixels).  Candidates are enumerated as
  (quad, pixel-offset) pairs — a dense, vectorizable set.
* Containment is decided by the same two barycentric triangle solves with
  ``uv_delta`` tolerance as the reference (rectify.py:530-573).
* The reference's first-writer-wins race resolution (rectify.py:547-552) is
  made deterministic and parallel: each accepted candidate carries its
  quad's row-major rank; a scatter-min per target pixel picks exactly the
  quad the reference's sequential loop would have written first, so results
  match the reference bit-for-bit while every candidate evaluates in
  parallel.

The numpy implementation below is the float64 semantics reference; the same
algorithm runs under jax.jit via scatter-min (``.at[].min``) for the device
path (see `inverse_ij_map_jax`).
"""

from __future__ import annotations

import numpy as np


def _fdet(px0, py0, px1, py1, px2, py2):
    return (px0 - px1) * (py0 - py2) - (px0 - px2) * (py0 - py1)


def _fu(px, py, px0, py0, px2, py2):
    return (px0 - px) * (py0 - py2) - (py0 - py) * (px0 - px2)


def _fv(px, py, px0, py0, px1, py1):
    return (py0 - py) * (px0 - px1) - (px0 - px) * (py0 - py1)


def inverse_ij_map(
    src_x: np.ndarray,
    src_y: np.ndarray,
    src_i_min: int,
    src_j_min: int,
    dst_shape: tuple[int, int],
    dst_x_offset: float,
    dst_y_offset: float,
    dst_x_scale: float,
    dst_y_scale: float,
    uv_delta: float,
) -> np.ndarray:
    """Compute the (2, dst_h, dst_w) float64 fractional source (i, j) map
    for a destination block, from 2D source coordinate images.

    Equivalent to reference `_compute_target_source_ij_sequential`
    (rectify.py:424-576) under its sequential write order.
    """
    dst_h, dst_w = dst_shape

    from ..native import inverse_ij_map_native

    native = inverse_ij_map_native(
        src_x,
        src_y,
        src_i_min,
        src_j_min,
        dst_shape,
        dst_x_offset,
        dst_y_offset,
        dst_x_scale,
        dst_y_scale,
        uv_delta,
    )
    if native is not None:
        return native

    out = np.full((2, dst_h, dst_w), np.nan, dtype=np.float64)

    src_h, src_w = src_x.shape
    if src_h < 2 or src_w < 2:
        return out

    # quad corners; quad (j0, i0) has corners (j0,i0),(j0,i1),(j1,i0),(j1,i1)
    p0x = src_x[:-1, :-1]
    p1x = src_x[:-1, 1:]
    p2x = src_x[1:, :-1]
    p3x = src_x[1:, 1:]
    p0y = src_y[:-1, :-1]
    p1y = src_y[:-1, 1:]
    p2y = src_y[1:, :-1]
    p3y = src_y[1:, 1:]

    # destination pixel rect per quad: floor((corner - offset)/scale) over
    # the 4 corners; elementwise min/max avoids materializing corner stacks
    with np.errstate(invalid="ignore"):
        cx_min = np.minimum(np.minimum(p0x, p1x), np.minimum(p2x, p3x))
        cx_max = np.maximum(np.maximum(p0x, p1x), np.maximum(p2x, p3x))
        cy_min = np.minimum(np.minimum(p0y, p1y), np.minimum(p2y, p3y))
        cy_max = np.maximum(np.maximum(p0y, p1y), np.maximum(p2y, p3y))
        if dst_x_scale >= 0:
            i_lo = np.floor((cx_min - dst_x_offset) / dst_x_scale)
            i_hi = np.floor((cx_max - dst_x_offset) / dst_x_scale)
        else:
            i_lo = np.floor((cx_max - dst_x_offset) / dst_x_scale)
            i_hi = np.floor((cx_min - dst_x_offset) / dst_x_scale)
        if dst_y_scale >= 0:
            j_lo = np.floor((cy_min - dst_y_offset) / dst_y_scale)
            j_hi = np.floor((cy_max - dst_y_offset) / dst_y_scale)
        else:
            j_lo = np.floor((cy_max - dst_y_offset) / dst_y_scale)
            j_hi = np.floor((cy_min - dst_y_offset) / dst_y_scale)
        nan_rect = np.isnan(i_lo) | np.isnan(j_lo)
        i_lo = np.nan_to_num(i_lo, nan=-(10.0**9))
        i_hi = np.nan_to_num(i_hi, nan=-(10.0**9))
        j_lo = np.nan_to_num(j_lo, nan=-(10.0**9))
        j_hi = np.nan_to_num(j_hi, nan=-(10.0**9))

    alive = (
        ~nan_rect
        & (i_hi >= 0)
        & (j_hi >= 0)
        & (i_lo < dst_w)
        & (j_lo < dst_h)
    )

    # triangle determinants (NaN -> 0, both-zero quads dropped,
    # rectify.py:530-541)
    det_a = _fdet(p0x, p0y, p1x, p1y, p2x, p2y)
    det_b = _fdet(p3x, p3y, p2x, p2y, p1x, p1y)
    det_a = np.nan_to_num(det_a, nan=0.0)
    det_b = np.nan_to_num(det_b, nan=0.0)
    alive &= (det_a != 0.0) | (det_b != 0.0)

    if not alive.any():
        return out

    # flat dense per-quad arrays (no up-front compression: the dominant
    # cost is the triangle solves, which run on per-offset subsets below)
    nqj, nqi = src_h - 1, src_w - 1
    alive_f = alive.reshape(-1)
    corners = {
        "p0x": p0x.reshape(-1),
        "p0y": p0y.reshape(-1),
        "p1x": p1x.reshape(-1),
        "p1y": p1y.reshape(-1),
        "p2x": p2x.reshape(-1),
        "p2y": p2y.reshape(-1),
        "p3x": p3x.reshape(-1),
        "p3y": p3y.reshape(-1),
        "det_a": det_a.reshape(-1),
        "det_b": det_b.reshape(-1),
    }
    qi_f = np.tile(np.arange(nqi, dtype=np.int64), nqj)
    qj_f = np.repeat(np.arange(nqj, dtype=np.int64), nqi)

    i_lo_q = np.clip(i_lo.reshape(-1), 0, dst_w - 1).astype(np.int64)
    i_hi_q = np.clip(i_hi.reshape(-1), 0, dst_w - 1).astype(np.int64)
    j_lo_q = np.clip(j_lo.reshape(-1), 0, dst_h - 1).astype(np.int64)
    j_hi_q = np.clip(j_hi.reshape(-1), 0, dst_h - 1).astype(np.int64)

    r_i = int((i_hi_q[alive_f] - i_lo_q[alive_f]).max()) + 1
    r_j = int((j_hi_q[alive_f] - j_lo_q[alive_f]).max()) + 1

    u_min = v_min = -uv_delta
    uv_max = 1.0 + 2 * uv_delta

    # winner-rank map: quad row-major rank == the reference's write order
    rank = qj_f * nqi + qi_f
    inf_rank = np.iinfo(np.int64).max
    claim = np.full(dst_h * dst_w, inf_rank, dtype=np.int64)

    # pass 1: scatter-min the rank of each accepting candidate per pixel.
    # Candidates are compressed to the in-rect subset before the triangle
    # solves.
    accept_cache = []
    for dj in range(r_j):
        for di in range(r_i):
            pixel_j = j_lo_q + dj
            pixel_i = i_lo_q + di
            mask = alive_f & (pixel_j <= j_hi_q) & (pixel_i <= i_hi_q)
            sel = np.nonzero(mask)[0]
            if sel.size == 0:
                continue
            q_sel = {k: v[sel] for k, v in corners.items()}
            accept, src_if, src_jf = _accept_quad(
                q_sel,
                qi_f[sel],
                qj_f[sel],
                pixel_i[sel],
                pixel_j[sel],
                dst_x_offset,
                dst_y_offset,
                dst_x_scale,
                dst_y_scale,
                u_min,
                v_min,
                uv_max,
            )
            if not accept.any():
                continue
            acc_sel = sel[accept]
            flat = pixel_j[acc_sel] * dst_w + pixel_i[acc_sel]
            accept_cache.append((acc_sel, flat, src_if[accept], src_jf[accept]))
            np.minimum.at(claim, flat, rank[acc_sel])

    # pass 2: write the winning candidates' fractional source coordinates
    out_i = out[0].reshape(-1)
    out_j = out[1].reshape(-1)
    for acc_sel, flat, src_if, src_jf in accept_cache:
        win = claim[flat] == rank[acc_sel]
        if win.any():
            out_i[flat[win]] = src_i_min + src_if[win]
            out_j[flat[win]] = src_j_min + src_jf[win]

    return out


def _accept_quad(
    q,
    qi,
    qj,
    pixel_i,
    pixel_j,
    dst_x_offset,
    dst_y_offset,
    dst_x_scale,
    dst_y_scale,
    u_min,
    v_min,
    uv_max,
    xp=np,
):
    """Evaluate the reference's two-triangle containment test for candidate
    (quad, pixel) pairs; returns (accept, fractional src_i, src_j) relative
    to the source window."""
    dst_x = dst_x_offset + (pixel_i + 0.5) * dst_x_scale
    dst_y = dst_y_offset + (pixel_j + 0.5) * dst_y_scale

    det_a = q["det_a"]
    det_b = q["det_b"]
    p0x, p0y = q["p0x"], q["p0y"]
    p1x, p1y = q["p1x"], q["p1y"]
    p2x, p2y = q["p2x"], q["p2y"]
    p3x, p3y = q["p3x"], q["p3y"]

    clamp = lambda x: xp.clip(x, 0.0, 1.0)  # noqa: E731

    safe_a = xp.where(det_a == 0.0, 1.0, det_a)
    ua = _fu(dst_x, dst_y, p0x, p0y, p2x, p2y) / safe_a
    va = _fv(dst_x, dst_y, p0x, p0y, p1x, p1y) / safe_a
    ok_a = (
        (det_a != 0.0)
        & (ua >= u_min)
        & (va >= v_min)
        & (ua + va <= uv_max)
    )

    if xp is np:
        # numpy host path: evaluate the second triangle only where the
        # first rejected (the reference's short-circuit, rectify.py:566)
        src_if = qi + clamp(ua)
        src_jf = qj + clamp(va)
        accept = ok_a.copy()
        nb = np.nonzero(~ok_a & (det_b != 0.0))[0]
        if nb.size:
            dxb = dst_x[nb]
            dyb = dst_y[nb]
            ub = _fu(dxb, dyb, p3x[nb], p3y[nb], p1x[nb], p1y[nb]) / det_b[nb]
            vb = _fv(dxb, dyb, p3x[nb], p3y[nb], p2x[nb], p2y[nb]) / det_b[nb]
            ok_b = (ub >= u_min) & (vb >= v_min) & (ub + vb <= uv_max)
            hit = nb[ok_b]
            accept[hit] = True
            src_if[hit] = (qi[hit] + 1) - clamp(ub[ok_b])
            src_jf[hit] = (qj[hit] + 1) - clamp(vb[ok_b])
        return accept, src_if, src_jf

    safe_b = xp.where(det_b == 0.0, 1.0, det_b)
    ub = _fu(dst_x, dst_y, p3x, p3y, p1x, p1y) / safe_b
    vb = _fv(dst_x, dst_y, p3x, p3y, p2x, p2y) / safe_b
    ok_b = (
        (det_b != 0.0)
        & (ub >= u_min)
        & (vb >= v_min)
        & (ub + vb <= uv_max)
    )

    src_i_a = qi + clamp(ua)
    src_j_a = qj + clamp(va)
    src_i_b = (qi + 1) - clamp(ub)
    src_j_b = (qj + 1) - clamp(vb)

    use_b = ~ok_a & ok_b
    accept = ok_a | ok_b
    src_if = xp.where(use_b, src_i_b, src_i_a)
    src_jf = xp.where(use_b, src_j_b, src_j_a)
    return accept, src_if, src_jf


def inverse_ij_map_jax(
    src_x,
    src_y,
    src_i_min: int,
    src_j_min: int,
    dst_shape: tuple[int, int],
    dst_x_offset: float,
    dst_y_offset: float,
    dst_x_scale: float,
    dst_y_scale: float,
    uv_delta: float,
    r_i: int = 4,
    r_j: int = 4,
):
    """XLA/device variant of :func:`inverse_ij_map` (jit-compatible, static
    shapes).  Same candidate-enumeration + scatter-min algorithm; the quad
    set is kept dense (dead quads carry an infinite rank) and the candidate
    rectangle is bounded by the static (r_j, r_i) — callers size it from
    host metadata (after pre-downscaling a quad covers only a few target
    pixels, reference rectify.py:136-143 guarantees this).
    """
    import jax.numpy as jnp

    dst_h, dst_w = dst_shape
    src_h, src_w = src_x.shape
    nq = (src_h - 1) * (src_w - 1)
    size = dst_h * dst_w

    p0x = src_x[:-1, :-1].reshape(-1)
    p1x = src_x[:-1, 1:].reshape(-1)
    p2x = src_x[1:, :-1].reshape(-1)
    p3x = src_x[1:, 1:].reshape(-1)
    p0y = src_y[:-1, :-1].reshape(-1)
    p1y = src_y[:-1, 1:].reshape(-1)
    p2y = src_y[1:, :-1].reshape(-1)
    p3y = src_y[1:, 1:].reshape(-1)

    qj = jnp.repeat(jnp.arange(src_h - 1), src_w - 1)
    qi = jnp.tile(jnp.arange(src_w - 1), src_h - 1)

    pi = jnp.floor(
        (jnp.stack([p0x, p1x, p2x, p3x]) - dst_x_offset) / dst_x_scale
    )
    pj = jnp.floor(
        (jnp.stack([p0y, p1y, p2y, p3y]) - dst_y_offset) / dst_y_scale
    )
    nan_rect = jnp.isnan(pi).any(axis=0) | jnp.isnan(pj).any(axis=0)
    pi = jnp.nan_to_num(pi, nan=-(10.0**9))
    pj = jnp.nan_to_num(pj, nan=-(10.0**9))
    i_lo = pi.min(axis=0)
    i_hi = pi.max(axis=0)
    j_lo = pj.min(axis=0)
    j_hi = pj.max(axis=0)

    det_a = jnp.nan_to_num(_fdet(p0x, p0y, p1x, p1y, p2x, p2y), nan=0.0)
    det_b = jnp.nan_to_num(_fdet(p3x, p3y, p2x, p2y, p1x, p1y), nan=0.0)

    alive = (
        ~nan_rect
        & (i_hi >= 0)
        & (j_hi >= 0)
        & (i_lo < dst_w)
        & (j_lo < dst_h)
        & ((det_a != 0.0) | (det_b != 0.0))
    )

    i_lo_q = jnp.clip(i_lo, 0, dst_w - 1).astype(jnp.int32)
    i_hi_q = jnp.clip(i_hi, 0, dst_w - 1).astype(jnp.int32)
    j_lo_q = jnp.clip(j_lo, 0, dst_h - 1).astype(jnp.int32)
    j_hi_q = jnp.clip(j_hi, 0, dst_h - 1).astype(jnp.int32)

    u_min = v_min = -uv_delta
    uv_max = 1.0 + 2 * uv_delta
    q = dict(
        p0x=p0x, p0y=p0y, p1x=p1x, p1y=p1y,
        p2x=p2x, p2y=p2y, p3x=p3x, p3y=p3y,
        det_a=det_a, det_b=det_b,
    )

    inf_rank = jnp.iinfo(jnp.int32).max
    rank = jnp.where(alive, (qj * (src_w - 1) + qi).astype(jnp.int32), inf_rank)
    claim = jnp.full((size + 1,), inf_rank, dtype=jnp.int32)

    candidates = []
    for dj in range(r_j):
        for di in range(r_i):
            pixel_j = j_lo_q + dj
            pixel_i = i_lo_q + di
            in_rect = (pixel_j <= j_hi_q) & (pixel_i <= i_hi_q)
            accept, src_if, src_jf = _accept_quad(
                q, qi, qj, pixel_i, pixel_j,
                dst_x_offset, dst_y_offset, dst_x_scale, dst_y_scale,
                u_min, v_min, uv_max, xp=jnp,
            )
            ok = accept & in_rect & alive
            flat = jnp.where(ok, pixel_j * dst_w + pixel_i, size)
            claim = claim.at[flat].min(jnp.where(ok, rank, inf_rank))
            candidates.append((ok, flat, src_if, src_jf))

    out_i = jnp.full((size + 1,), jnp.nan, dtype=src_x.dtype)
    out_j = jnp.full((size + 1,), jnp.nan, dtype=src_x.dtype)
    for ok, flat, src_if, src_jf in candidates:
        win = ok & (claim[flat] == rank)
        slot = jnp.where(win, flat, size)
        out_i = out_i.at[slot].set(
            jnp.where(win, src_i_min + src_if, out_i[slot]), mode="drop"
        )
        out_j = out_j.at[slot].set(
            jnp.where(win, src_j_min + src_jf, out_j[slot]), mode="drop"
        )

    return jnp.stack(
        [out_i[:size].reshape(dst_h, dst_w), out_j[:size].reshape(dst_h, dst_w)]
    )


def make_device_var_image_fn(
    ij_map: np.ndarray,
    src_shape: tuple[int, int],
    fill_value,
    interp_method: str,
):
    """Compile a device Phase-B kernel: resample a batch of source bands
    through a fixed fractional (i, j) map (the map is built once per
    geometry by Phase A; every band/time-step then streams through this
    jitted kernel on the TPU — the multi-band fast path of rectify).

    When the map is smooth enough (measured against the true per-pixel
    field), the gather-free SRW tap kernel is used instead of the XLA
    gather — Phase A's output is just another coordinate field to SRW."""
    import jax
    import jax.numpy as jnp

    src_h, src_w = src_shape
    valid_np = ~np.isnan(ij_map[0]) & ~np.isnan(ij_map[1])
    valid = jnp.asarray(valid_np)
    fill = jnp.float32(fill_value)

    import os

    # dispatch measured on v5e (OLCI-size map): the single-tap nearest
    # gather already streams acceptably (~515 Mpix/s) and beats SRW's
    # multi-tap structure there, so SRW engages for bilinear only.
    # XRTPU_PHASEB_SRW=0/1 forces the choice for experiments.
    srw_env = os.environ.get("XRTPU_PHASEB_SRW", "")
    use_srw = (
        interp_method == "bilinear" if srw_env == "" else srw_env == "1"
    )
    if use_srw and interp_method in ("nearest", "bilinear"):
        from scipy.ndimage import binary_erosion

        from .srw import fields_from_ij_map, make_srw_fn, plan_srw

        # SRW needs a smooth field: the interior of the coverage is (the
        # swath geometry itself), but the NaN-filled band at the coverage
        # edge is extrapolation.  Resolve the interior gather-free and the
        # thin edge band by a compacted per-pixel gather (a few % of the
        # pixels at the serialized-gather rate is negligible).
        step = 16
        interior = binary_erosion(valid_np, iterations=step + 2)
        edge = valid_np & ~interior
        fields = fields_from_ij_map(
            ij_map, src_h, src_w, step=step, gate_mask=interior
        )
        plan = (
            plan_srw(None, None, fields=fields)
            if fields is not None
            else None
        )
        if plan is not None and interior.any():
            from .srw import make_srw_fn_batched

            n_ops = (
                plan.base_v.shape[1] * plan.d_v
                + plan.base_h.shape[0] * plan.d_h
            )
            n_elems = (
                plan.src_h * plan.src_w + plan.out_h * plan.out_w
            )
            make = (
                make_srw_fn_batched
                if n_ops > 128 and n_elems < 64_000_000
                else make_srw_fn
            )
            srw_fn = make(plan, interp_method, fill_value)
            interior_j = jnp.asarray(interior)
            edge_rows, edge_cols = np.nonzero(edge)
            e_rows = jnp.asarray(edge_rows)
            e_cols = jnp.asarray(edge_cols)
            ix_e = jnp.asarray(
                ij_map[0][edge_rows, edge_cols], dtype=jnp.float32
            )
            iy_e = jnp.asarray(
                ij_map[1][edge_rows, edge_cols], dtype=jnp.float32
            )

            @jax.jit
            def fn_srw(src, ixe, iye, er, ec, inter):
                from .reproject_ops import gather_interp

                out = srw_fn(src)
                out = jnp.where(inter, out, fill)
                if er.shape[0]:
                    vals = gather_interp(
                        src, ixe, iye, interp_method, fill_value, jnp
                    )
                    out = out.at[..., er, ec].set(vals)
                return out

            def fn(src):
                return fn_srw(src, ix_e, iy_e, e_rows, e_cols, interior_j)

            return fn

    ix = jnp.asarray(np.nan_to_num(ij_map[0], nan=0.0), dtype=jnp.float32)
    iy = jnp.asarray(np.nan_to_num(ij_map[1], nan=0.0), dtype=jnp.float32)

    @jax.jit
    def kernel(src, ixd, iyd, validd):
        from .reproject_ops import gather_interp

        vals = gather_interp(
            src, ixd, iyd, interp_method, fill_value, jnp, valid=validd
        )
        return vals

    def fn(src):
        return kernel(src, ix, iy, valid)

    return fn


def var_image_from_ij_map(
    src_var: np.ndarray,
    ij_map: np.ndarray,
    fill_value,
    interp_method: str,
    out_dtype=None,
) -> np.ndarray:
    """Phase B: gather source pixels through the fractional (i, j) map with
    nearest / triangular / bilinear interpolation — vectorized port of
    reference `_compute_var_image_block` / `_compute_var_image_for_dest_line`
    (rectify.py:605-734), including the float64 upcast and the window
    min/max slicing with +2 pad."""
    out_dtype = np.dtype(out_dtype or src_var.dtype)
    dst_h, dst_w = ij_map.shape[-2], ij_map.shape[-1]
    dst_shape = src_var.shape[:-2] + (dst_h, dst_w)
    dst_out = np.full(dst_shape, fill_value, dtype=out_dtype)
    if np.all(np.isnan(ij_map[0])):
        return dst_out

    src_bbox = (
        int(np.nanmin(ij_map[0])),
        int(np.nanmin(ij_map[1])),
        min(int(np.nanmax(ij_map[0])) + 2, src_var.shape[-1]),
        min(int(np.nanmax(ij_map[1])) + 2, src_var.shape[-2]),
    )
    # no float64 copy of the window: the gathered taps promote to float64
    # in the arithmetic below (u/v are float64), which is value-identical
    # to upcasting the window first and halves the staging traffic
    window = src_var[..., src_bbox[1] : src_bbox[3], src_bbox[0] : src_bbox[2]]
    if window.dtype.kind not in "fc":
        window = window.astype(np.float64)
    src_h, src_w = window.shape[-2], window.shape[-1]

    src_i_f = ij_map[0] - src_bbox[0]
    src_j_f = ij_map[1] - src_bbox[1]
    valid = ~(np.isnan(src_i_f) | np.isnan(src_j_f))
    src_i_f = np.nan_to_num(src_i_f, nan=0.0)
    src_j_f = np.nan_to_num(src_j_f, nan=0.0)

    # truncation (int()) matches the reference's positive-index floor
    i0 = src_i_f.astype(np.int64)
    j0 = src_j_f.astype(np.int64)
    u = src_i_f - i0
    v = src_j_f - j0

    if interp_method == "nearest":
        i_sel = np.where(u > 0.5, np.clip(i0 + 1, 0, src_w - 1), i0)
        j_sel = np.where(v > 0.5, np.clip(j0 + 1, 0, src_h - 1), j0)
        i_sel = np.clip(i_sel, 0, src_w - 1)
        j_sel = np.clip(j_sel, 0, src_h - 1)
        values = window[..., j_sel, i_sel]
    elif interp_method in ("triangular", "bilinear"):
        i0c = np.clip(i0, 0, src_w - 1)
        j0c = np.clip(j0, 0, src_h - 1)
        i1 = np.clip(i0c + 1, 0, src_w - 1)
        j1 = np.clip(j0c + 1, 0, src_h - 1)
        v00 = window[..., j0c, i0c]
        v01 = window[..., j0c, i1]
        v10 = window[..., j1, i0c]
        v11 = window[..., j1, i1]
        if interp_method == "triangular":
            near = v00 + u * (v01 - v00) + v * (v10 - v00)
            far = v11 + (1.0 - u) * (v10 - v11) + (1.0 - v) * (v01 - v11)
            values = np.where(u + v < 1.0, near, far)
        else:
            vu0 = v00 + u * (v01 - v00)
            vu1 = v10 + u * (v11 - v10)
            values = vu0 + v * (vu1 - vu0)
    else:
        raise NotImplementedError(
            f"interp_methods must be one of 0, 1, 'nearest', 'bilinear', "
            f"'triangular', was '{interp_method}'."
        )

    if out_dtype.kind in "ui":
        values = np.rint(values)
    dst_out = np.where(valid, values.astype(out_dtype), dst_out)
    return dst_out.astype(out_dtype)
