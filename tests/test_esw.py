"""Exact separable warp (ops/esw.py): the gather-free kernel must reproduce
the direct gather kernel exactly — same taps, same validity mask, same
values up to lerp-order float32 rounding (ESW lerps vertically first by
construction, the gather kernel horizontally first; the products are
mathematically identical and differ by at most a few ulp).  Nearest has no
lerp and must be BIT-exact.  This is the accuracy contract that lets ESW be
the default extreme-warp path with no fidelity gate."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import (
    make_esw_region_fn,
    make_esw_reproject_fn,
    plan_esw,
)
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn


def _assert_exact(a, b, bilinear=False):
    """Identical NaN masks; bit-identical values (nearest) or within 4
    float32 ulp of unit scale (bilinear lerp-order rounding: ESW lerps
    vertically first, the gather kernel horizontally first — measured
    difference on these cases is 2 ulp)."""
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    fa = np.nan_to_num(a).astype(np.float32)
    fb = np.nan_to_num(b).astype(np.float32)
    if not bilinear:
        np.testing.assert_array_equal(fa, fb)
        return
    d = np.abs(fa - fb)
    # data is in [0, 1): 4 ulp at 1.0 = 4 * 2^-24
    assert d.max() <= 4 * 2.0**-24, f"max abs diff {d.max():.3e}"


def _utm_case(src=96, out=80):
    """Mild warp (UTM32 -> LAEA regional window)."""
    source_gm = GridMapping.regular(
        size=(src, src), xy_min=(565000.0, 5930000.0), xy_res=100.0,
        crs="epsg:32632",
    )
    target_gm = GridMapping.regular(
        size=(out, out), xy_min=(4320500, 3379500), xy_res=100,
        crs="epsg:3035",
    )
    return source_gm, target_gm


def _severe_case():
    """Rotation-heavy continental warp that the default SRW fidelity gate
    rejects (test_srw.py::test_srw_chooser_handles_severe_warp)."""
    source_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180.0, -90.0), xy_res=0.5, crs="epsg:4326"
    )
    target_gm = GridMapping.regular(
        size=(512, 256), xy_min=(900000.0, 900000.0), xy_res=7000.0,
        crs="epsg:3035",
    )
    return source_gm, target_gm


def _extreme_case():
    """Domain-scale warp with the projection singularity inside the target:
    no single plan covers it -> region mosaic."""
    source_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180, -90), xy_res=0.5, crs="EPSG:4326"
    )
    target_gm = GridMapping.regular(
        size=(512, 512), xy_min=(900000.0, 900000.0), xy_res=10000.0,
        crs="EPSG:3035",
    )
    return source_gm, target_gm


def _rand(shape, seed=0):
    return np.random.default_rng(seed).random(shape, dtype=np.float32)


@pytest.mark.parametrize("interp", ["bilinear", "nearest", "triangular"])
@pytest.mark.parametrize("case", [_utm_case, _severe_case])
def test_esw_matches_gather(interp, case):
    source_gm, target_gm = case()
    esw = make_esw_reproject_fn(source_gm, target_gm, interp, np.nan)
    assert esw is not None, "ESW plan unexpectedly rejected"
    gat = make_fused_reproject_fn(source_gm, target_gm, interp, np.nan)

    data = _rand((source_gm.height, source_gm.width))
    a = np.asarray(esw(jnp.asarray(data)))
    b = np.asarray(gat(jnp.asarray(data)))

    assert np.isfinite(b).mean() > 0.5
    _assert_exact(a, b, bilinear=interp != "nearest")


def test_esw_batched():
    source_gm, target_gm = _severe_case()
    esw = make_esw_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    gat = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    data = _rand((3, source_gm.height, source_gm.width), seed=2)
    a = np.asarray(esw(jnp.asarray(data)))
    b = np.asarray(gat(jnp.asarray(data)))
    assert a.shape == (3, 256, 512)
    _assert_exact(a, b, bilinear=True)


def test_esw_plan_adapts_sample_count():
    source_gm, target_gm = _severe_case()
    plan = plan_esw(source_gm, target_gm)
    assert plan is not None
    # rotation-heavy: needs more than the minimal window, stays bounded
    assert 3 <= plan.n_samples <= 10
    assert plan.d_v <= 40 and plan.d_h <= 40


@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
@pytest.mark.slow
def test_esw_region_mosaic_matches_gather(interp):
    """Quadtree mosaic over the singular extreme case: every planned piece
    and every gather-fallback piece reproduces direct gather semantics, so
    the full mosaic matches the whole-target gather kernel (ulp-level for
    bilinear, bit-exact for nearest)."""
    source_gm, target_gm = _extreme_case()
    fn = make_esw_region_fn(
        source_gm, target_gm, interp, np.nan, base_split=2, max_depth=2
    )
    assert fn is not None
    gat = make_fused_reproject_fn(source_gm, target_gm, interp, np.nan)
    data = _rand((source_gm.height, source_gm.width), seed=3)
    a = np.asarray(fn(jnp.asarray(data)))
    b = np.asarray(gat(jnp.asarray(data)))
    assert np.isfinite(b).mean() > 0.9
    _assert_exact(a, b, bilinear=interp == "bilinear")


@pytest.mark.slow
def test_esw_region_mosaic_singular_domain_grouped():
    """Domain-scale config with the projection singularity inside the
    target (the global-grid benchmark class): the shape-keyed piece
    groups, the batched gather-fallback group and the canvas scatter
    together still reproduce the whole-target gather kernel exactly."""
    source_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180.0, -90.0), xy_res=0.5,
        crs="epsg:4326",
    )
    target_gm = GridMapping.regular(
        size=(1024, 1024), xy_min=(2000000.0, 1000000.0), xy_res=6000.0,
        crs="epsg:3035",
    )
    fn = make_esw_region_fn(source_gm, target_gm, "bilinear", np.nan)
    assert fn is not None
    data = _rand((source_gm.height, source_gm.width), seed=11)
    a = np.asarray(fn(jnp.asarray(data)))
    b = np.asarray(
        make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)(
            jnp.asarray(data)
        )
    )
    assert np.array_equal(np.isnan(a), np.isnan(b))
    both = ~np.isnan(a)
    assert float(np.abs(a[both] - b[both]).max()) < 1e-6


def _severe_ds(source_gm, data):
    from xcube_resampling_tpu.crs import CRS
    from xcube_resampling_tpu.xrlite import DataArray, Dataset

    ds = Dataset(
        dict(
            band=DataArray(
                # jax-backed -> routes through the device path
                jnp.asarray(data), dims=("y", "x"),
                attrs=dict(grid_mapping="spatial_ref"),
            )
        ),
        coords=dict(
            x=np.asarray(source_gm.x_coords.data),
            y=np.asarray(source_gm.y_coords.data),
            spatial_ref=np.array(0),
        ),
    )
    ds["spatial_ref"].attrs.update(CRS.from_epsg("4326").to_cf())
    return ds


def test_exact_env_forces_esw_end_to_end(monkeypatch):
    """XRTPU_EXACT=1 skips the gated two-pass tier: the device path's
    result must match the gather kernel at ulp level on a warp the gate
    would otherwise serve with two-pass filter semantics."""
    from xcube_resampling_tpu.reproject import reproject_dataset

    monkeypatch.setenv("XRTPU_EXACT", "1")
    source_gm, target_gm = _severe_case()
    data = _rand((source_gm.height, source_gm.width), seed=4)
    out = reproject_dataset(_severe_ds(source_gm, data), target_gm)
    gat = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    b = np.asarray(gat(jnp.asarray(data)))
    a = np.asarray(out.band.values, dtype=np.float32)
    _assert_exact(a, b, bilinear=True)


def test_default_device_path_exact_beyond_gate(monkeypatch):
    """Rotation past the two-pass slope gate: the default device path
    (no env flags) routes to ESW and matches the gather kernel at ulp
    level — the old behavior was a 40x-slower whole-target gather."""
    from xcube_resampling_tpu.ops.srw import make_srw_reproject_fn
    from xcube_resampling_tpu.reproject import reproject_dataset

    monkeypatch.delenv("XRTPU_EXACT", raising=False)
    monkeypatch.delenv("XRTPU_FAST_EXTREME_WARP", raising=False)
    source_gm = GridMapping.regular(
        size=(720, 360), xy_min=(-180.0, -90.0), xy_res=0.5, crs="epsg:4326"
    )
    # target finer than the source (no downscale pre-pass) but rotated
    # past the two-pass gate
    target_gm = GridMapping.regular(
        size=(256, 256), xy_min=(2500000.0, 1400000.0), xy_res=15000.0,
        crs="epsg:3035",
    )
    # the gate must reject this case (else the test is vacuous)
    assert make_srw_reproject_fn(source_gm, target_gm, "bilinear", np.nan) is None
    data = _rand((source_gm.height, source_gm.width), seed=5)
    out = reproject_dataset(_severe_ds(source_gm, data), target_gm)
    gat = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    b = np.asarray(gat(jnp.asarray(data)))
    a = np.asarray(out.band.values, dtype=np.float32)
    _assert_exact(a, b, bilinear=True)


@pytest.mark.slow
def test_default_device_path_mosaic_for_singular_warp(monkeypatch):
    """Domain-scale warp with the projection singularity inside the
    target: the DEFAULT device path now builds the exact region mosaic
    (round 1 fell back to the 40x-slower whole-target gather) and must
    match the gather kernel at lerp-order tolerance."""
    from xcube_resampling_tpu.reproject import reproject_dataset

    monkeypatch.delenv("XRTPU_EXACT", raising=False)
    monkeypatch.delenv("XRTPU_FAST_EXTREME_WARP", raising=False)
    monkeypatch.delenv("XRTPU_NO_EXACT_MOSAIC", raising=False)
    source_gm, target_gm = _extreme_case()
    data = _rand((source_gm.height, source_gm.width), seed=6)
    out = reproject_dataset(_severe_ds(source_gm, data), target_gm)
    gat = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
    b = np.asarray(gat(jnp.asarray(data)))
    a = np.asarray(out.band.values, dtype=np.float32)
    _assert_exact(a, b, bilinear=True)


# ---- static-cover formulation (_static_cover / cfg.jv / cfg.jh) ---------


def test_static_cover_invariants():
    """The cover must be monotone with unit increments and reach every tap
    in [base(r), base(r)+d) within its J-window, for every lane."""
    from xcube_resampling_tpu.ops.esw import _static_cover

    rng = np.random.default_rng(42)
    # increments <= +1 (arbitrary dips allowed): the feasible regime
    n, lanes, d = 257, 3, 9
    base = (
        np.cumsum(rng.random((n, lanes)) < 0.6, axis=0)
        - np.cumsum(rng.random((n, lanes)) < 0.3, axis=0)
    ).astype(np.int32)
    cov, J_t = _static_cover(base, d, axis=0)
    J = int(J_t.max())
    assert cov is not None and cov.shape == (n + J, lanes)
    assert (np.diff(cov.astype(np.int64), axis=0) >= 0).all()
    assert (np.diff(cov.astype(np.int64), axis=0) <= 1).all()
    # per-lane slice counts: each lane's OWN J-window must already reach
    # every needed tap (the kernel stops each tile at its lane count)
    for c in range(lanes):
        for r in range(n):
            win = set(cov[r : r + int(J_t[c]), c].tolist())
            need = set(range(int(base[r, c]), int(base[r, c]) + d))
            assert need <= win, (r, c)

    # per-lane diversity: lanes with smaller d need no larger windows
    d_lane = np.array([d, d - 4, 2], dtype=np.int64)
    cov_l, J_l = _static_cover(base, d_lane, axis=0)
    assert cov_l is not None and (J_l <= J_t).all()
    for c in range(lanes):
        for r in range(n):
            win = set(cov_l[r : r + int(J_l[c]), c].tolist())
            need = set(
                range(int(base[r, c]), int(base[r, c]) + int(d_lane[c]))
            )
            assert need <= win, (r, c)

    # a base that advances faster than one per index is infeasible
    steep = (2 * np.arange(n, dtype=np.int32))[:, None]
    cov2, _ = _static_cover(steep, d, axis=0)
    assert cov2 is None

    # axis=1: same contract on transposed layout
    cov3, J3_t = _static_cover(base.T.copy(), d, axis=1)
    J3 = int(J3_t.max())
    assert cov3 is not None and cov3.shape == (lanes, n + J3)
    np.testing.assert_array_equal(cov3, cov[: n + J3].T) if J3 == J else None


@pytest.mark.parametrize("interp", ["bilinear", "nearest", "triangular"])
def test_esw_static_formulation_bit_equal(interp, monkeypatch):
    """Forcing the static-cover formulation must not change one output bit
    relative to the dynamic-take formulation (same taps, same selects —
    only the routing differs)."""
    source_gm, target_gm = _severe_case()
    monkeypatch.setenv("XRTPU_ESW_STATIC", "0")
    dyn = make_esw_reproject_fn(source_gm, target_gm, interp, np.nan)
    monkeypatch.setenv("XRTPU_ESW_STATIC", "1")
    sta = make_esw_reproject_fn(source_gm, target_gm, interp, np.nan)
    plan = plan_esw(source_gm, target_gm)
    assert plan.jv > 0 and plan.jh > 0, "static cover unexpectedly infeasible"

    data = _rand((source_gm.height, source_gm.width), seed=3)
    a = np.asarray(dyn(jnp.asarray(data)))
    b = np.asarray(sta(jnp.asarray(data)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_esw_pertile_counts_bit_equal(interp, monkeypatch):
    """Per-tile tap/slice counts must not change one output bit relative
    to the plan-max counts (extra iterations only ever re-select values
    already routed, or select nothing)."""
    source_gm, target_gm = _severe_case()
    data = _rand((source_gm.height, source_gm.width), seed=5)
    monkeypatch.setenv("XRTPU_ESW_PERTILE", "0")
    uni = make_esw_reproject_fn(source_gm, target_gm, interp, np.nan)
    monkeypatch.setenv("XRTPU_ESW_PERTILE", "1")
    per = make_esw_reproject_fn(source_gm, target_gm, interp, np.nan)
    plan = plan_esw(source_gm, target_gm)
    assert plan.d_v_t is not None and min(plan.d_v_t) < plan.d_v, (
        "case no longer exercises per-tile variation"
    )
    a = np.asarray(uni(jnp.asarray(data)))
    b = np.asarray(per(jnp.asarray(data)))
    np.testing.assert_array_equal(a, b)


def test_esw_region_mosaic_perpiece_bit_equal(monkeypatch):
    """Per-piece kernel configs in the unrolled mosaic loop must
    reproduce the group-max mosaic bit-for-bit."""
    source_gm, target_gm = _extreme_case()
    data = _rand((source_gm.height, source_gm.width), seed=13)
    monkeypatch.setenv("XRTPU_MOSAIC_PERPIECE", "0")
    monkeypatch.setenv("XRTPU_ESW_PERTILE", "0")
    grp = make_esw_region_fn(source_gm, target_gm, "bilinear", np.nan)
    monkeypatch.setenv("XRTPU_MOSAIC_PERPIECE", "1")
    monkeypatch.setenv("XRTPU_ESW_PERTILE", "1")
    per = make_esw_region_fn(source_gm, target_gm, "bilinear", np.nan)
    assert grp is not None and per is not None
    a = np.asarray(grp(jnp.asarray(data)))
    b = np.asarray(per(jnp.asarray(data)))
    np.testing.assert_array_equal(a, b)


def test_esw_region_mosaic_static_bit_equal(monkeypatch):
    """The region mosaic with static-cover groups must reproduce the
    dynamic mosaic bit-for-bit (group uniformization pads member covers)."""
    source_gm, target_gm = _extreme_case()
    data = _rand((source_gm.height, source_gm.width), seed=9)
    monkeypatch.setenv("XRTPU_ESW_STATIC", "0")
    dyn = make_esw_region_fn(source_gm, target_gm, "bilinear", np.nan)
    monkeypatch.setenv("XRTPU_ESW_STATIC", "1")
    sta = make_esw_region_fn(source_gm, target_gm, "bilinear", np.nan)
    assert dyn is not None and sta is not None
    a = np.asarray(dyn(jnp.asarray(data)))
    b = np.asarray(sta(jnp.asarray(data)))
    np.testing.assert_array_equal(a, b)
