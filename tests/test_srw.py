"""Separable-residual warp kernel: parity with the gather-based device path
and the host engine (the gather-free fast path must not change results)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn
from xcube_resampling_tpu.ops.srw import make_srw_reproject_fn, plan_srw


def _case(src=96, out=80):
    source_gm = GridMapping.regular(
        size=(src, src), xy_min=(565000.0, 5930000.0), xy_res=100.0, crs="epsg:32632"
    )
    target_gm = GridMapping.regular(
        size=(out, out), xy_min=(4320500, 3379500), xy_res=100, crs="epsg:3035"
    )
    data = (
        np.arange(src * src, dtype=np.float32).reshape(src, src) / src
    )
    return source_gm, target_gm, data


@pytest.mark.parametrize("interp", ["bilinear", "nearest", "triangular"])
def test_srw_matches_gather_kernel(interp):
    source_gm, target_gm, data = _case()
    srw = make_srw_reproject_fn(source_gm, target_gm, interp, np.nan,
                                col_tile=32, row_tile=32)
    assert srw is not None, "plan unexpectedly rejected"
    gat = make_fused_reproject_fn(source_gm, target_gm, interp, np.nan)

    a = np.asarray(srw(jnp.asarray(data)))
    b = np.asarray(gat(jnp.asarray(data)))

    both = ~np.isnan(a) & ~np.isnan(b)
    assert both.mean() > 0.5
    if interp == "bilinear":
        # identical coordinate approximation; only fp association differs
        np.testing.assert_allclose(a[both], b[both], atol=1e-4)
    elif interp == "triangular":
        # the bilinear - s*Delta correction samples Delta at the two-pass
        # positions: pixels whose position sits within the gate tolerance
        # of a cell boundary may pick the neighbouring quad's Delta —
        # allow a tiny fraction of such flips, tight values elsewhere
        close = np.abs(a[both] - b[both]) < 1e-3 * (
            1.0 + np.abs(b[both])
        )
        assert close.mean() > 0.99
        np.testing.assert_allclose(
            np.sort(a[both])[both.sum() // 2],
            np.sort(b[both])[both.sum() // 2],
            rtol=1e-4,
        )
    else:
        # two-pass nearest may flip to the equally-distant neighbour on
        # rounding boundaries (cf. the reference's own tie comment,
        # rectify.py:549-551) — allow a small fraction of one-cell flips
        assert (np.abs(a[both] - b[both]) > 1e-6).mean() < 0.01
    assert (np.isnan(a) != np.isnan(b)).mean() < 0.02


def test_srw_batched():
    source_gm, target_gm, data = _case()
    srw = make_srw_reproject_fn(source_gm, target_gm, "bilinear", np.nan,
                                col_tile=32, row_tile=32)
    batch = jnp.stack([jnp.asarray(data), 2 * jnp.asarray(data)])
    out = np.asarray(srw(batch))
    assert out.shape[0] == 2
    valid = ~np.isnan(out[0])
    np.testing.assert_allclose(out[1][valid], 2 * out[0][valid], rtol=1e-5)


def test_srw_plan_reports_taps():
    source_gm, target_gm, _ = _case()
    plan = plan_srw(source_gm, target_gm, col_tile=32, row_tile=32)
    assert plan is not None
    assert 2 <= plan.d_v <= 48
    assert 2 <= plan.d_h <= 48


def test_srw_rejects_cubic():
    source_gm, target_gm, _ = _case()
    assert make_srw_reproject_fn(source_gm, target_gm, "cubic") is None


def test_srw_triangular_batched_exact_on_linear_field():
    """On an affine source field the triangular correction term Delta is
    identically zero, so SRW triangular must equal SRW bilinear exactly;
    both kernel variants (looped and batched) agree with the gather."""
    source_gm, target_gm, _ = _case()
    src = 96
    jj, ii = np.mgrid[0:src, 0:src].astype(np.float32)
    data = 3.0 * ii - 2.0 * jj + 7.0
    gat = make_fused_reproject_fn(
        source_gm, target_gm, "triangular", np.nan
    )
    b = np.asarray(gat(jnp.asarray(data)))
    for kwargs in (
        dict(col_tile=32, row_tile=32),  # looped kernel
        dict(),  # default tiling (may select the batched kernel)
    ):
        srw = make_srw_reproject_fn(
            source_gm, target_gm, "triangular", np.nan, **kwargs
        )
        assert srw is not None
        a = np.asarray(srw(jnp.asarray(data)))
        both = ~np.isnan(a) & ~np.isnan(b)
        assert both.mean() > 0.5
        np.testing.assert_allclose(a[both], b[both], atol=1e-3)


def test_srw_aligned_matches_gather_kernel():
    """Severe-warp case (continental 4326->3035): the aligned strategy must
    agree with the gather kernel."""
    from xcube_resampling_tpu.ops.srw import (
        _coarse_geometry,
        make_srw_aligned_fn,
        plan_srw_aligned,
    )

    source_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180.0, -90.0), xy_res=0.5, crs="epsg:4326"
    )
    target_gm = GridMapping.regular(
        size=(256, 256),
        xy_min=(3200000.0, 2000000.0),
        xy_res=8000.0,
        crs="epsg:3035",
    )
    fields = _coarse_geometry(source_gm, target_gm, 16)
    plan = plan_srw_aligned(source_gm, target_gm, fields=fields, max_taps=24)
    assert plan is not None, "aligned plan unexpectedly rejected"
    assert plan.d_v <= 24 and plan.d_h <= 24

    # smooth field: two-pass and tensor-product bilinear agree to O(h^2)
    jj, ii = np.meshgrid(np.arange(360), np.arange(720), indexing="ij")
    data = (jj / 360.0 + np.sin(ii / 40.0)).astype(np.float32)
    srw = make_srw_aligned_fn(plan, "bilinear", np.nan)
    gat = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    a = np.asarray(srw(jnp.asarray(data)))
    b = np.asarray(gat(jnp.asarray(data)))
    both = ~np.isnan(a) & ~np.isnan(b)
    assert both.mean() > 0.5
    np.testing.assert_allclose(a[both], b[both], atol=5e-3)
    assert (np.isnan(a) != np.isnan(b)).mean() < 0.02


def test_srw_chooser_handles_severe_warp():
    """Rotation-heavy warps exceed the two-pass fidelity gate on the
    default path (fall back to exact gather) but plan in the opt-in fast
    mode."""
    source_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180.0, -90.0), xy_res=0.5, crs="epsg:4326"
    )
    target_gm = GridMapping.regular(
        size=(128, 128),
        xy_min=(2500000.0, 1400000.0),
        xy_res=30000.0,
        crs="epsg:3035",
    )
    assert make_srw_reproject_fn(source_gm, target_gm, "bilinear", np.nan) is None
    fn = make_srw_reproject_fn(
        source_gm, target_gm, "bilinear", np.nan, allow_hybrid=True
    )
    assert fn is not None
    data = np.random.default_rng(1).random((360, 720)).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(data)))
    assert np.isfinite(out).mean() > 0.5


def _extreme_case():
    """Scaled-down full-plane 4326 -> 3035: domain-scale rotation that
    defeats both the tiled and the aligned strategies (and, near the
    projection singularity, the whole-domain hybrid via its curvature
    gate)."""
    src_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180, -90), xy_res=0.5, crs="EPSG:4326"
    )
    tgt_gm = GridMapping.regular(
        size=(512, 512), xy_min=(900000.0, 900000.0), xy_res=10000.0,
        crs="EPSG:3035",
    )
    return src_gm, tgt_gm


def _moderate_hybrid_case():
    """Southern 3035 window: strong rotation but away from the singular
    corners — the whole-domain hybrid plan applies."""
    src_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180, -90), xy_res=0.5, crs="EPSG:4326"
    )
    tgt_gm = GridMapping.regular(
        size=(512, 256), xy_min=(900000.0, 900000.0), xy_res=7000.0,
        crs="EPSG:3035",
    )
    return src_gm, tgt_gm


def _exact_truth(src_gm, tgt_gm, data64):
    """Float64 per-pixel inverse transform + direct bilinear (ground
    truth, no coarse fields)."""
    from xcube_resampling_tpu.crs import Transformer

    t = Transformer.from_crs(tgt_gm.crs, src_gm.crs)
    tx = np.asarray(tgt_gm.x_coords.data, np.float64)
    ty = np.asarray(tgt_gm.y_coords.data, np.float64)
    xx_t, yy_t = np.meshgrid(tx, ty)
    sx, sy = t.transform(xx_t, yy_t)
    sxs = np.asarray(src_gm.x_coords.data, np.float64)
    sys_ = np.asarray(src_gm.y_coords.data, np.float64)
    ix = (sx - sxs[0]) / (sxs[1] - sxs[0])
    iy = (sy - sys_[0]) / (sys_[1] - sys_[0])
    h, w = data64.shape
    valid = (ix > -0.5) & (ix < w - 0.5) & (iy > -0.5) & (iy < h - 0.5)
    i0 = np.clip(np.floor(np.clip(ix, 0, w - 1)).astype(int), 0, w - 2)
    j0 = np.clip(np.floor(np.clip(iy, 0, h - 1)).astype(int), 0, h - 2)
    fi = np.clip(ix, 0, w - 1) - i0
    fj = np.clip(iy, 0, h - 1) - j0
    tr = (1 - fj) * ((1 - fi) * data64[j0, i0] + fi * data64[j0, i0 + 1]) + (
        fj
    ) * ((1 - fi) * data64[j0 + 1, i0] + fi * data64[j0 + 1, i0 + 1])
    return np.where(valid, tr, np.nan)


def test_hybrid_plans_where_others_fail():
    from xcube_resampling_tpu.ops.srw import (
        plan_srw_aligned,
        plan_srw_hybrid,
    )

    src_gm, tgt_gm = _extreme_case()
    assert plan_srw(src_gm, tgt_gm) is None
    assert plan_srw_aligned(src_gm, tgt_gm) is None
    plan = plan_srw_hybrid(src_gm, tgt_gm)
    assert plan is not None
    assert plan.d_v <= 32 and plan.d_h <= 32


def test_hybrid_exact_on_linear_field():
    """With the curvature gate, hybrid output matches exact direct
    bilinear on linear data to field-interp accuracy."""
    from xcube_resampling_tpu.ops.srw import (
        make_srw_hybrid_fn,
        plan_srw_hybrid,
    )

    src_gm, tgt_gm = _moderate_hybrid_case()
    plan = plan_srw_hybrid(src_gm, tgt_gm)
    yy, xx = np.mgrid[0:360, 0:720].astype(np.float64)
    data64 = (xx + 2 * yy) / 1000
    got = np.asarray(
        make_srw_hybrid_fn(plan, "bilinear", np.nan)(
            jnp.asarray(data64.astype(np.float32))
        )
    )
    truth = _exact_truth(src_gm, tgt_gm, data64)
    both = ~np.isnan(got) & ~np.isnan(truth)
    assert both.mean() > 0.5
    np.testing.assert_allclose(got[both], truth[both], atol=5e-3)
    assert (np.isnan(got) != np.isnan(truth)).mean() < 0.01


def test_hybrid_close_on_smooth_field():
    from xcube_resampling_tpu.ops.srw import (
        make_srw_hybrid_fn,
        plan_srw_hybrid,
    )

    src_gm, tgt_gm = _moderate_hybrid_case()
    plan = plan_srw_hybrid(src_gm, tgt_gm)
    yy, xx = np.mgrid[0:360, 0:720].astype(np.float64)
    data64 = np.sin(xx / 40) * np.cos(yy / 30)
    got = np.asarray(
        make_srw_hybrid_fn(plan, "bilinear", np.nan)(
            jnp.asarray(data64.astype(np.float32))
        )
    )
    truth = _exact_truth(src_gm, tgt_gm, data64)
    both = ~np.isnan(got) & ~np.isnan(truth)
    d = np.abs(got[both] - truth[both])
    assert d.max() < 0.02 and d.mean() < 5e-3


def test_hybrid_is_opt_in():
    src_gm, tgt_gm = _extreme_case()
    # default: severe warp -> no SRW function (gather fallback preserves
    # direct-bilinear semantics)
    assert make_srw_reproject_fn(src_gm, tgt_gm, "bilinear") is None
    fn = make_srw_reproject_fn(src_gm, tgt_gm, "bilinear", allow_hybrid=True)
    assert fn is not None


def test_hybrid_nearest_produces_source_values():
    from xcube_resampling_tpu.ops.srw import (
        make_srw_hybrid_fn,
        plan_srw_hybrid,
    )

    src_gm, tgt_gm = _moderate_hybrid_case()
    plan = plan_srw_hybrid(src_gm, tgt_gm)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 50, size=(360, 720)).astype(np.float32)
    got = np.asarray(make_srw_hybrid_fn(plan, "nearest", np.nan)(jnp.asarray(data)))
    valid = ~np.isnan(got)
    assert valid.mean() > 0.5
    assert np.isin(got[valid], np.arange(50, dtype=np.float32)).all()


@pytest.mark.slow
def test_region_reproject_extreme_case_vs_exact():
    """Region decomposition covers the full extreme case at direct-bilinear
    accuracy: high-curvature regions are routed to the gather kernel by the
    curvature gate, the rest run gather-free."""
    from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

    src_gm, tgt_gm = _extreme_case()
    fn = make_region_reproject_fn(
        src_gm, tgt_gm, "bilinear", np.nan, base_split=2, max_depth=1
    )
    assert fn is not None
    yy, xx = np.mgrid[0:360, 0:720].astype(np.float64)
    for data64, atol in (
        ((xx + 2 * yy) / 1000, 5e-3),
        (np.sin(xx / 40) * np.cos(yy / 30), 3e-2),
    ):
        got = np.asarray(fn(jnp.asarray(data64.astype(np.float32))))
        truth = _exact_truth(src_gm, tgt_gm, data64)
        both = ~np.isnan(got) & ~np.isnan(truth)
        assert both.mean() > 0.9
        d = np.abs(got[both] - truth[both])
        assert d.max() < atol, f"max err {d.max():.2e} vs atol {atol}"
        assert (np.isnan(got) != np.isnan(truth)).mean() < 0.01


@pytest.mark.slow
def test_region_reproject_nearest_and_batched():
    from xcube_resampling_tpu.ops.srw import make_region_reproject_fn

    src_gm, tgt_gm = _extreme_case()
    fn = make_region_reproject_fn(
        src_gm, tgt_gm, "nearest", np.nan, base_split=2, max_depth=1
    )
    assert fn is not None
    rng = np.random.default_rng(2)
    data = rng.integers(0, 40, size=(2, 360, 720)).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(data)))
    assert out.shape == (2, 512, 512)
    valid = ~np.isnan(out[0])
    assert valid.mean() > 0.9
    assert np.isin(out[0][valid], np.arange(40, dtype=np.float32)).all()
    # batch consistency: second band is an independent input
    fn2 = make_region_reproject_fn(
        src_gm, tgt_gm, "nearest", np.nan, base_split=2, max_depth=1
    )
    single = np.asarray(fn2(jnp.asarray(data[1])))
    np.testing.assert_array_equal(
        np.nan_to_num(out[1]), np.nan_to_num(single)
    )
