"""Why does the global-config quadtree split below 1024^2? (host-only)

Round-5 probe: per-region planning outcome at each quadtree size for the
global 4326->3035 exact mosaic.  For every attempted region, log which
gate failed (fields / iystar monotone / n_samples / tiling-d / op budget)
and the would-be static-cover length of the best over-diversity tiling —
quantifies how many pieces a cover-length feasibility gate would rescue.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops import esw
from xcube_resampling_tpu.ops.esw import (
    _Fields, _interp_cols, _interp_rows, _max_row_deviation, _offset_fields,
    _slice_raw, _static_cover, plan_esw,
)
from xcube_resampling_tpu.ops.srw import (
    _iystar_from_fields, _raw_coarse_fields, _source_window_gm,
)

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0),
                                xy_res=0.05, crs="epsg:4326")
target_gm = GridMapping.regular(size=(4096, 4096),
                                xy_min=(2000000.0, 1000000.0),
                                xy_res=1500.0, crs="epsg:3035")

step = 16
out_h, out_w = target_gm.height, target_gm.width
src_h_g, src_w_g = source_gm.height, source_gm.width
ix_r, iy_r = _raw_coarse_fields(source_gm, target_gm, step)

rows = []

def diagnose(r0, r1, c0, c1):
    ixs, iys = _slice_raw(ix_r, iy_r, step, r0, r1, c0, c1)
    finite = np.isfinite(ixs) & np.isfinite(iys)
    if not finite.all():
        return ("nonfinite", None)
    iystar_s = _iystar_from_fields(ixs, iys, src_w_g, step)
    if iystar_s is None:
        return ("iystar", None)
    f = _Fields(ixs, iys, iystar_s, step, src_h_g, src_w_g, r1 - r0, c1 - c0)
    f_plan = f
    win = None
    w = _source_window_gm(source_gm, f, margin=8 + 48)
    if w is not None:
        _, win = w
        f_plan = _offset_fields(f, *win)
    plan = plan_esw(source_gm, target_gm, step=step, fields=f_plan,
                    fields_global=f, win=win)
    if plan is not None:
        eff_v = plan.jv if plan.jv else plan.d_v
        eff_h = plan.jh if plan.jh else plan.d_h
        est = (-(-plan.src_w // plan.col_tile) * eff_v * (1 + plan.n_samples)
               + -(-plan.out_h // plan.row_tile) * eff_h
               * (2 * plan.n_samples + 6))
        return ("planned" if est <= 4000 else "opbudget",
                dict(S=plan.n_samples, d_v=plan.d_v, d_h=plan.d_h,
                     jv=plan.jv, jh=plan.jh, est=est))
    # plan failed: find which gate.  Recompute the pieces by hand.
    iystar = f_plan.iystar64
    ix64 = f_plan.ix64
    dev = _max_row_deviation(f_plan)
    n_samples = max(3, int(np.ceil(2.0 * (dev + 0.35))) + 2)
    if n_samples > 10:
        return ("n_samples", dict(S=n_samples))
    # tiling diagnosis: best candidate's max-d and its would-be cover len
    info = {}
    for axis, (layout, res) in (
        ("v", ("v", _interp_rows(iystar, f_plan.out_h, step))),
        ("h", ("h", _interp_cols(ix64, f_plan.out_w, step))),
    ):
        best = None
        for cand in (512, 256, 128, 64, 32, 16):
            if layout == "v":
                n_t = -(-f_plan.src_w // cand)
                base = np.zeros((f_plan.out_h, n_t), np.int32)
                d_t = np.zeros(n_t, np.int64)
                cs_ = None
                for t in range(n_t):
                    c0_ = t * cand
                    c1_ = min((t + 1) * cand, f_plan.src_w)
                    k0 = max(0, c0_ // step - 1)
                    k1 = min(iystar.shape[1], -(-c1_ // step) + 1)
                    seg = res[:, k0:k1]
                    m = seg.min(axis=1)
                    half = (n_samples - 2) / 2.0
                    base[:, t] = np.floor(m - half).astype(np.int32) - 2
                    d_t[t] = (int(np.ceil(float((seg.max(axis=1) - m).max())))
                              + n_samples + 4)
                cov, j_t = _static_cover(base, int(d_t.max()), axis=0)
            else:
                n_t = -(-f_plan.out_h // cand)
                base = np.zeros((n_t, f_plan.out_w), np.int32)
                d_t = np.zeros(n_t, np.int64)
                sample_rows = np.arange(ix64.shape[0]) * step
                for t in range(n_t):
                    r0_ = t * cand
                    r1_ = min((t + 1) * cand, f_plan.out_h)
                    k0 = max(0, int(np.searchsorted(sample_rows, r0_)) - 1)
                    k1 = min(ix64.shape[0],
                             int(np.searchsorted(sample_rows, r1_)) + 2)
                    seg = res[k0:k1, :]
                    m = seg.min(axis=0)
                    base[t, :] = np.floor(m).astype(np.int32) - 2
                    d_t[t] = int(np.ceil(float((seg.max(axis=0) - m).max()))) + 5
                cov, j_t = _static_cover(base, int(d_t.max()), axis=1)
            jmax = int(j_t.max()) if j_t is not None else -1
            entry = (int(d_t.max()), jmax, cand)
            if best is None or entry < best:
                best = entry
        info[axis] = best
    return ("tiling", info)

def walk(r0, r1, c0, c1, depth):
    verdict, info = diagnose(r0, r1, c0, c1)
    print(f"{'  '*depth}[{r1-r0}x{c1-c0}] ({r0},{c0}): {verdict} {info}",
          flush=True)
    if verdict in ("planned",):
        return
    half_r = (r1 - r0) // 2 // step * step
    half_c = (c1 - c0) // 2 // step * step
    if depth < 4 and half_r >= 128 and half_c >= 128:
        rm, cm = r0 + half_r, c0 + half_c
        walk(r0, rm, c0, cm, depth + 1)
        walk(r0, rm, cm, c1, depth + 1)
        walk(rm, r1, c0, cm, depth + 1)
        walk(rm, r1, cm, c1, depth + 1)

rb = (-(-out_h // 2) + step - 1) // step * step
cb = (-(-out_w // 2) + step - 1) // step * step
for bj in range(2):
    for bi in range(2):
        r0, r1 = bj * rb, min((bj + 1) * rb, out_h)
        c0, c1 = bi * cb, min((bi + 1) * cb, out_w)
        walk(r0, r1, c0, c1, 0)
