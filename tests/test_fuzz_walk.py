"""Randomized Newton-walk-vs-host parity for rectify Phase A.

The walk tier (ops/rectify_ops.py inverse_ij_map_walk) promises host-
kernel-identical winners and NaN coverage on every swath its gate
accepts.  Random smooth swath geometries (rotation, anisotropy, shear,
curvature, partial coverage) probe the convergence properties the
per-case tests cannot cover combinatorially; geometries the gate
rejects must fall back, never mis-map.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.ops import rectify_ops

pytestmark = pytest.mark.slow

from tests.test_fuzz_srw import FUZZ_FULL

WALK_CASES = 24 if FUZZ_FULL else 12


def _rand_swath(rng):
    """A smooth, fold-free random swath: rotated + sheared + curved grid
    with mild random detail."""
    h = int(rng.integers(40, 160))
    w = int(rng.integers(40, 160))
    jj, ii = np.meshgrid(
        np.arange(h, dtype=np.float64),
        np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    ang = rng.uniform(0, 2 * np.pi)
    sx = rng.uniform(0.5, 2.0)
    sy = rng.uniform(0.5, 2.0)
    shear = rng.uniform(-0.4, 0.4)
    ca, sa = np.cos(ang), np.sin(ang)
    x = sx * (ii + shear * jj)
    y = sy * jj
    lon = ca * x - sa * y
    lat = sa * x + ca * y
    # smooth curvature + small noise (kept well below the fold limit)
    lon = lon + rng.uniform(-1, 1) * 3e-3 * (jj - h / 2) ** 2 / h
    lat = lat + rng.uniform(-1, 1) * 3e-3 * (ii - w / 2) ** 2 / w
    lon = lon + 0.02 * rng.standard_normal((h, w))
    lat = lat + 0.02 * rng.standard_normal((h, w))
    return lon, lat


def test_fuzz_hybrid_parity():
    """Same contract for the hybrid (corner-walk-seeded tiled stencil)
    tier: host-kernel-identical winners and NaN coverage on every swath
    it engages, across random rotated/sheared/curved geometries."""
    rng = np.random.default_rng(20260818)
    engaged = 0
    for _case in range(WALK_CASES):
        src_x, src_y = _rand_swath(rng)
        x0 = float(np.nanmin(src_x)) + rng.uniform(-5, 20)
        y1 = float(np.nanmax(src_y)) - rng.uniform(-5, 20)
        res = rng.uniform(0.4, 2.5)
        dst_w = int(rng.integers(30, 160))
        dst_h = int(rng.integers(30, 160))
        args = (
            0, 0, (dst_h, dst_w), x0, y1, res, -res, UV_DELTA,
        )
        hyb = rectify_ops.inverse_ij_map_hybrid(src_x, src_y, *args)
        if hyb is None:
            continue
        engaged += 1
        hm = hyb.as_numpy()
        host = rectify_ops.inverse_ij_map(src_x, src_y, *args)
        assert np.array_equal(np.isnan(hm), np.isnan(host)), (
            f"case {_case}: NaN coverage mismatch "
            f"({(np.isnan(hm) != np.isnan(host)).sum()} px)"
        )
        np.testing.assert_allclose(
            hm, host, rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"case {_case}",
        )
    floor = 16 if FUZZ_FULL else 8
    assert engaged >= floor, (
        f"hybrid engaged only {engaged}/{WALK_CASES} cases"
    )


def test_fuzz_walk_parity():
    rng = np.random.default_rng(20260817)
    engaged = 0
    for _case in range(WALK_CASES):
        src_x, src_y = _rand_swath(rng)
        # random destination grid framing part of the swath
        x0 = float(np.nanmin(src_x)) + rng.uniform(-5, 20)
        y1 = float(np.nanmax(src_y)) - rng.uniform(-5, 20)
        res = rng.uniform(0.4, 2.5)
        dst_w = int(rng.integers(30, 160))
        dst_h = int(rng.integers(30, 160))
        args = (
            0, 0, (dst_h, dst_w), x0, y1, res, -res, UV_DELTA,
        )
        walked = rectify_ops.inverse_ij_map_walk(src_x, src_y, *args)
        if walked is None:
            continue
        engaged += 1
        wm = walked.as_numpy()
        host = rectify_ops.inverse_ij_map(src_x, src_y, *args)
        assert np.array_equal(np.isnan(wm), np.isnan(host)), (
            f"case {_case}: NaN coverage mismatch "
            f"({(np.isnan(wm) != np.isnan(host)).sum()} px)"
        )
        np.testing.assert_allclose(
            wm, host, rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"case {_case}",
        )
    # the generator produces clean fold-free swaths: the gate must accept
    # the overwhelming majority
    floor = 18 if FUZZ_FULL else 9
    assert engaged >= floor, (
        f"walk engaged only {engaged}/{WALK_CASES} cases"
    )
