"""Device-kernel parity: the jax/XLA kernels must reproduce the float64
numpy semantics-reference kernels (the rebuild's analogue of the reference
running numba kernels with JIT disabled under test)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.ops import coarsen_ops, gather, rectify_ops


rng = np.random.default_rng(42)


@pytest.mark.parametrize("agg", ["mean", "sum", "std", "var", "median", "min",
                                 "max", "first", "last", "center"])
def test_coarsen_parity_float(agg):
    data = rng.random((2, 12, 16))
    data[0, 3, 4] = np.nan
    ref = coarsen_ops.coarsen_numpy(data, 3, 4, _agg_fn(agg))
    dev = np.asarray(coarsen_ops.coarsen_jax(jnp.asarray(data), 3, 4, agg))
    np.testing.assert_allclose(dev, ref, rtol=1e-12, equal_nan=True)


@pytest.mark.parametrize("agg", ["mean", "sum", "center", "mode"])
def test_coarsen_parity_int(agg):
    data = rng.integers(0, 7, (12, 16)).astype(np.int32)
    ref = coarsen_ops.coarsen_numpy(data, 3, 4, _agg_fn(agg))
    dev = np.asarray(coarsen_ops.coarsen_jax(jnp.asarray(data), 3, 4, agg))
    np.testing.assert_array_equal(dev, ref)


def _agg_fn(name):
    from xcube_resampling_tpu.constants import AGG_METHODS

    return AGG_METHODS[name]


@pytest.mark.parametrize("order", [0, 1])
def test_affine_gather_parity(order):
    data = rng.random((10, 12))
    data[2, 3] = np.nan
    ref = gather.affine_gather(
        data, 0.7, 1.3, -0.4, 0.2, 16, 9, order, np.nan
    )
    dev = np.asarray(
        gather.affine_gather(
            jnp.asarray(data), 0.7, 1.3, -0.4, 0.2, 16, 9, order, np.nan, xp=jnp
        )
    )
    np.testing.assert_allclose(dev, ref, rtol=1e-12, equal_nan=True)


@pytest.mark.parametrize("interp", ["nearest", "triangular", "bilinear"])
def test_grid_sample_parity(interp):
    data = rng.random((3, 10, 12))
    iy = rng.uniform(0, 9, (7, 8))
    ix = rng.uniform(0, 11, (7, 8))
    ref = gather.grid_sample(data, ix, iy, interp)
    dev = np.asarray(
        gather.grid_sample(jnp.asarray(data), jnp.asarray(ix), jnp.asarray(iy), interp)
    )
    np.testing.assert_allclose(dev, ref, rtol=1e-12)


def _swath(h, w, seed=0):
    r = np.random.default_rng(seed)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lon = 1.0 * ii - 0.4 * jj + 0.03 * r.random((h, w))
    lat = 56.0 - 1.0 * jj - 0.2 * ii + 0.03 * r.random((h, w))
    return lon.astype(np.float64), lat.astype(np.float64)


def test_inverse_ij_map_jax_parity():
    """The jitted scatter-min Phase A must equal the numpy reference on an
    irregular swath (same first-writer-wins winner per pixel)."""
    src_x, src_y = _swath(6, 7)
    dst_shape = (20, 24)
    args = (0, 0, dst_shape, -3.0, 57.0, 0.5, -0.5, UV_DELTA)

    ref = rectify_ops.inverse_ij_map(src_x, src_y, *args)
    dev = np.asarray(
        rectify_ops.inverse_ij_map_jax(
            jnp.asarray(src_x), jnp.asarray(src_y), *args, r_i=8, r_j=8
        )
    )
    np.testing.assert_allclose(dev, ref, rtol=1e-12, equal_nan=True)


def test_inverse_ij_map_walk_parity():
    """The planner-free Newton-walk Phase A must reproduce the host
    kernel on a clean fold-free swath: identical NaN coverage, identical
    winners, positions to float64 rounding (same triangle formulas, the
    walk merely solves in normalized grid units)."""
    from tests.sampledata import create_olci_like_swath

    from xcube_resampling_tpu.gridmapping import GridMapping

    ds = create_olci_like_swath(width=233, height=307, tile_size=128)
    gm = GridMapping.from_dataset(ds)
    tgm = gm.to_regular(tile_size=128)
    src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
    x_min, _y_min, _x_max, y_max = tgm.xy_bbox
    args = (
        src_xy[0], src_xy[1], 0, 0, (tgm.height, tgm.width),
        x_min, y_max, tgm.x_res, -tgm.y_res, UV_DELTA,
    )

    walked = rectify_ops.inverse_ij_map_walk(*args)
    assert isinstance(walked, rectify_ops.DeviceIJMap)
    wm = walked.as_numpy()
    host = rectify_ops.inverse_ij_map(*args)

    assert np.array_equal(np.isnan(wm), np.isnan(host))
    np.testing.assert_allclose(
        wm, host, rtol=1e-9, atol=1e-9, equal_nan=True
    )


def test_inverse_ij_map_hybrid_parity():
    """The hybrid (corner-walk-seeded tiled stencil) Phase A must
    reproduce the host kernel on a clean fold-free swath: identical NaN
    coverage, identical winners, positions to float64 rounding (same
    triangle formulas and min-rank winner order; only the candidate
    enumeration differs)."""
    from tests.sampledata import create_olci_like_swath

    from xcube_resampling_tpu.gridmapping import GridMapping

    ds = create_olci_like_swath(width=233, height=307, tile_size=128)
    gm = GridMapping.from_dataset(ds)
    tgm = gm.to_regular(tile_size=128)
    src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
    x_min, _y_min, _x_max, y_max = tgm.xy_bbox
    args = (
        src_xy[0], src_xy[1], 0, 0, (tgm.height, tgm.width),
        x_min, y_max, tgm.x_res, -tgm.y_res, UV_DELTA,
    )

    hyb = rectify_ops.inverse_ij_map_hybrid(*args)
    assert isinstance(hyb, rectify_ops.DeviceIJMap)
    hm = hyb.as_numpy()
    host = rectify_ops.inverse_ij_map(*args)

    assert np.array_equal(np.isnan(hm), np.isnan(host))
    np.testing.assert_allclose(
        hm, host, rtol=1e-9, atol=1e-9, equal_nan=True
    )


def test_inverse_ij_map_hybrid_gate_and_kill_switch(monkeypatch):
    """The hybrid tier must refuse folded/NaN swaths (same gate as the
    walk) and honour XRTPU_PHASEA_HYBRID=0 in the tiered entry."""
    src_x, src_y = _swath(16, 17)
    args = (0, 0, (40, 44), -3.0, 57.0, 0.5, -0.5, UV_DELTA)

    assert rectify_ops.inverse_ij_map_hybrid(src_x, src_y, *args) is not None

    folded_x = src_x.copy()
    folded_x[8, 8] = src_x[8, 8] - 18.0
    assert rectify_ops.inverse_ij_map_hybrid(folded_x, src_y, *args) is None

    nan_x = src_x.copy()
    nan_x[2, 2] = np.nan
    assert rectify_ops.inverse_ij_map_hybrid(nan_x, src_y, *args) is None

    monkeypatch.setenv("XRTPU_PHASEA_HYBRID", "0")

    def _boom(*_a, **_k):
        raise AssertionError("hybrid called despite XRTPU_PHASEA_HYBRID=0")

    monkeypatch.setattr(rectify_ops, "inverse_ij_map_hybrid", _boom)
    rectify_ops.inverse_ij_map_device(src_x, src_y, *args)


def test_inverse_ij_map_hybrid_optimistic_window_reuse():
    """Repeated same-shaped geometries reuse the last call's window
    optimistically (the dense dispatch overlaps the meta fetch); a
    same-shaped geometry whose window need EXCEEDS the remembered one
    must fall back to the right-sized dispatch — results must equal the
    host kernel in both directions."""
    src_x, src_y = _swath(40, 44)

    # fine resolution first: small per-tile windows remembered
    fine = (0, 0, (64, 64), -3.0, 57.0, 0.35, -0.35, UV_DELTA)
    a1 = rectify_ops.inverse_ij_map_hybrid(src_x, src_y, *fine)
    a2 = rectify_ops.inverse_ij_map_hybrid(src_x, src_y, *fine)
    assert a1 is not None and a2 is not None
    np.testing.assert_array_equal(a1.as_numpy(), a2.as_numpy())
    np.testing.assert_allclose(
        a1.as_numpy(), rectify_ops.inverse_ij_map(src_x, src_y, *fine),
        rtol=1e-9, atol=1e-9, equal_nan=True,
    )

    # same dst shape, much coarser resolution: per-tile spans grow, the
    # remembered window cannot cover -> right-sized fallback, exact result
    coarse = (0, 0, (64, 64), -3.0, 57.0, 1.2, -1.2, UV_DELTA)
    b = rectify_ops.inverse_ij_map_hybrid(src_x, src_y, *coarse)
    assert b is not None
    np.testing.assert_allclose(
        b.as_numpy(), rectify_ops.inverse_ij_map(src_x, src_y, *coarse),
        rtol=1e-9, atol=1e-9, equal_nan=True,
    )


def test_inverse_ij_map_walk_gate_rejections(monkeypatch):
    """The walk must refuse swaths it cannot serve exactly: folded
    geometry (mixed quad orientation), NaN coordinates, and the
    XRTPU_PHASEA_WALK=0 kill switch (the tiered entry then falls to the
    host-planned stencil kernel)."""
    src_x, src_y = _swath(6, 7)
    args = (0, 0, (20, 24), -3.0, 57.0, 0.5, -0.5, UV_DELTA)

    # clean swath: the walk engages and the tiered entry uses it
    assert rectify_ops.inverse_ij_map_walk(src_x, src_y, *args) is not None

    # fold: flip one interior node far across the swath
    folded_x = src_x.copy()
    folded_x[3, 3] = src_x[3, 3] - 8.0
    assert rectify_ops.inverse_ij_map_walk(folded_x, src_y, *args) is None

    # NaN coordinates
    nan_x = src_x.copy()
    nan_x[2, 2] = np.nan
    assert rectify_ops.inverse_ij_map_walk(nan_x, src_y, *args) is None

    # kill switch: the tiered device entry must not touch the walk
    monkeypatch.setenv("XRTPU_PHASEA_WALK", "0")

    def _boom(*_a, **_k):
        raise AssertionError("walk called despite XRTPU_PHASEA_WALK=0")

    monkeypatch.setattr(rectify_ops, "inverse_ij_map_walk", _boom)
    rectify_ops.inverse_ij_map_device(src_x, src_y, *args)


def test_inverse_ij_map_jax_parity_2x2():
    lon = np.array([[1.0, 6.0], [0.0, 2.0]])
    lat = np.array([[56.0, 53.0], [52.0, 50.0]])
    args = (0, 0, (13, 13), -0.25, 56.25, 0.5, -0.5, UV_DELTA)
    ref = rectify_ops.inverse_ij_map(lon, lat, *args)
    dev = np.asarray(
        rectify_ops.inverse_ij_map_jax(
            jnp.asarray(lon), jnp.asarray(lat), *args, r_i=13, r_j=13
        )
    )
    np.testing.assert_allclose(dev, ref, rtol=1e-12, equal_nan=True)


def test_bbox_ops_parity():
    from xcube_resampling_tpu.gridmapping.bboxes import compute_ij_bboxes
    from xcube_resampling_tpu.ops import bbox_ops

    lon = np.broadcast_to(np.linspace(10.0, 20.0, 11)[None, :], (11, 11)).copy()
    lat = np.broadcast_to(np.linspace(50.0, 60.0, 11)[:, None], (11, 11)).copy()
    boxes = np.array(
        [
            [10.0, 50.0, 20.0, 60.0],
            [12.4, 51.6, 12.6, 51.7],
            [30.0, 70.0, 31.0, 71.0],
        ]
    )
    for border, ijb in [(0.0, 0), (0.5, 0), (2.0, 2)]:
        ref = np.full((3, 4), -1, dtype=np.int64)
        compute_ij_bboxes(lon, lat, boxes, border, ijb, ref)
        dev = np.asarray(
            bbox_ops.compute_ij_bboxes_jax(
                jnp.asarray(lon), jnp.asarray(lat), boxes, border, ijb
            )
        )
        np.testing.assert_array_equal(dev, ref)


def test_xy_bbox_parity():
    from xcube_resampling_tpu.gridmapping.bboxes import compute_xy_bbox
    from xcube_resampling_tpu.ops import bbox_ops

    xy = np.random.default_rng(0).random((2, 10, 12))
    xy[0, 3, 4] = np.nan
    ref = compute_xy_bbox(xy)
    dev = tuple(float(v) for v in bbox_ops.compute_xy_bbox_jax(jnp.asarray(xy)))
    np.testing.assert_allclose(dev, ref)


@pytest.mark.slow
@pytest.mark.parametrize("interp", ["bilinear", "triangular"])
def test_resident_srw_phase_b_parity(monkeypatch, interp):
    """Phase-B resident SRW (lattice-planned, no full-map fetch) matches
    the exact per-pixel gather on the OLCI-like swath: identical NaN
    coverage, values within the documented sub-0.05 px position tolerance
    of the taps (triangular rides the bilinear - s*Delta form)."""
    from tests.sampledata import create_olci_like_swath

    from xcube_resampling_tpu.constants import UV_DELTA
    from xcube_resampling_tpu.gridmapping import GridMapping
    from xcube_resampling_tpu.ops import rectify_ops
    from xcube_resampling_tpu.rectify import _compute_target_source_ij

    monkeypatch.setenv("XRTPU_PHASEA", "device")
    ds = create_olci_like_swath(width=400, height=520, tile_size=256)
    source_gm = GridMapping.from_dataset(ds)
    target_gm = source_gm.to_regular(tile_size=256)
    ij = _compute_target_source_ij(source_gm, target_gm, UV_DELTA)
    assert isinstance(ij, rectify_ops.DeviceIJMap)

    band = jnp.asarray(np.asarray(ds.rad.values, np.float32)[None])
    srw = rectify_ops._build_resident_srw_phase_b(
        ij.device_map(), ds.rad.shape, np.nan, interp
    )
    assert srw is not None, "lattice SRW plan unexpectedly rejected"

    monkeypatch.setenv("XRTPU_PHASEB_SRW", "0")
    ij._phase_b_fns = {}
    ref = np.asarray(
        rectify_ops.make_device_var_image_fn_resident(ij, np.nan, interp)(band)
    )
    got = np.asarray(srw(band))

    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got))
    ok = ~np.isnan(ref)
    # data range is ~100; 0.05 px of tap drift moves values < 0.5
    assert float(np.max(np.abs(ref[ok] - got[ok]))) < 0.5
