"""Randomized ESW-vs-gather exactness across CRS pairs (deterministic
seed).

Wherever the exact separable warp plans, it must reproduce the gather
kernel with its hard contract — bit-exact nearest, lerp-order-only
(<= 4 float32 ulp of data scale) bilinear — the property the per-case
tests cannot cover combinatorially.  Reuses the CRS pool and random
grid construction of test_fuzz_srw (targets centered on the transformed
source center, so the grids always overlap)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from xcube_resampling_tpu.crs import Transformer
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import make_esw_reproject_fn
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn

from tests.test_fuzz_srw import CRS_POOL, FUZZ_CASES, FUZZ_FULL, _rand_gm


pytestmark = pytest.mark.slow


def test_fuzz_esw_exactness():
    rng = np.random.default_rng(20260817)
    planned = 0
    for _ in range(FUZZ_CASES):
        src_crs, tgt_crs = (str(c) for c in rng.choice(CRS_POOL, 2, replace=False))
        try:
            sgm = _rand_gm(rng, src_crs)
            t = Transformer.from_crs(src_crs, tgt_crs)
            cx = (sgm.x_min + sgm.x_max) / 2
            cy = (sgm.y_min + sgm.y_max) / 2
            tcx, tcy = t.transform(cx, cy)
            if not (np.isfinite(tcx) and np.isfinite(tcy)):
                continue
            w = int(rng.integers(64, 256))
            h = int(rng.integers(64, 256))
            res = float(rng.uniform(0.3, 1.5)) * (
                (sgm.x_res if src_crs != "epsg:4326" else sgm.x_res * 1e5)
                / (1.0 if tgt_crs != "epsg:4326" else 1e5)
            )
            if tgt_crs == "epsg:4326" and abs(tcy) + h * res / 2 > 89:
                continue
            tgm = GridMapping.regular(
                size=(w, h), xy_min=(tcx - w * res / 2, tcy - h * res / 2),
                xy_res=res, crs=tgt_crs,
            )
        except ValueError:
            continue  # generated grid invalid (e.g. latitude overflow)
        interp = ("nearest", "bilinear", "triangular")[
            int(rng.integers(0, 3))
        ]
        esw = make_esw_reproject_fn(sgm, tgm, interp, np.nan)
        if esw is None:
            continue
        gat = make_fused_reproject_fn(sgm, tgm, interp, np.nan)
        data = rng.random((sgm.height, sgm.width), dtype=np.float32)
        a = np.asarray(esw(jnp.asarray(data)))
        b = np.asarray(gat(jnp.asarray(data)))
        if not np.isfinite(b).any():
            continue  # grids barely touch: nothing to compare
        planned += 1
        ctx = f"{src_crs}->{tgt_crs} {interp} {sgm.size}->{tgm.size}"
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=ctx)
        fa = np.nan_to_num(a)
        fb = np.nan_to_num(b)
        if interp == "nearest":
            np.testing.assert_array_equal(fa, fb, err_msg=ctx)
        else:
            d = np.abs(fa - fb)
            assert d.max() <= 4 * 2.0**-24, f"{ctx}: max abs diff {d.max():.3e}"
    floor = 8 if FUZZ_FULL else 3
    assert planned >= floor, f"only {planned} configurations planned"
