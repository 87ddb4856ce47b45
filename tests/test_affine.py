"""Affine engine goldens (port of reference tests/test_affine.py)."""

import numpy as np
import pytest

from xcube_resampling_tpu.affine import affine_transform_dataset
from xcube_resampling_tpu.crs import CRS, CRS_CRS84, CRS_WGS84
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.xrlite import DataArray, Dataset

from .sampledata import (
    create_2x8x6_dataset_with_regular_coords,
    create_8x6_dataset_with_regular_coords,
)

nan = np.nan
RES = 0.1


@pytest.fixture()
def source_ds():
    return create_8x6_dataset_with_regular_coords()


@pytest.fixture()
def source_gm(source_ds):
    return GridMapping.from_dataset(source_ds)


def _assert_vars(source_ds, target_ds):
    assert isinstance(target_ds, Dataset)
    assert set(source_ds.variables).union(["spatial_ref"]) == set(target_ds.variables)


def test_subset(source_ds, source_gm):
    target_gm = GridMapping.regular((3, 3), (50.0, 10.0), RES, source_gm.crs)
    target_ds = affine_transform_dataset(source_ds, target_gm, interp_methods=1)
    _assert_vars(source_ds, target_ds)
    assert (3, 3) == target_ds.refl.shape
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array([[1, 0, 2], [0, 3, 0], [4, 0, 1]]),
    )

    target_gm = GridMapping.regular((3, 3), (50.1, 10.1), RES, source_gm.crs)
    target_ds = affine_transform_dataset(source_ds, target_gm, interp_methods=1)
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array([[4, nan, nan], [0, 2, 0], [3, 0, 4]]),
    )

    target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, source_gm.crs)
    target_ds = affine_transform_dataset(source_ds, target_gm, interp_methods=1)
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array([[1.25, 1.5, nan], [1.0, 1.25, 1.5], [1.75, 1.0, 1.25]]),
    )

    target_ds = affine_transform_dataset(
        source_ds,
        target_gm,
        source_gm=source_gm,
        interp_methods=1,
        recover_nans=True,
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [[1.25, 1.5, 0.6666667], [1.0, 1.25, 1.5], [1.75, 1.0, 1.25]]
        ),
    )


def test_subset_3d(source_gm):
    source_ds_3d = create_2x8x6_dataset_with_regular_coords()
    target_gm = GridMapping.regular((3, 3), (50.0, 10.0), RES, source_gm.crs)
    target_ds = affine_transform_dataset(source_ds_3d, target_gm, interp_methods=1)
    _assert_vars(source_ds_3d, target_ds)
    assert (2, 3, 3) == target_ds.refl.shape
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [[1, 0, 2], [0, 3, 0], [4, 0, 1]],
                [[1, 0, 2], [0, 3, 0], [4, 0, 1]],
            ]
        ),
    )


def test_subset_with_source_gm(source_ds, source_gm):
    target_gm = GridMapping.regular((3, 3), (50.0, 10.0), RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods="bilinear"
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array([[1, 0, 2], [0, 3, 0], [4, 0, 1]]),
    )

    target_gm = GridMapping.regular((3, 3), (50.1, 10.1), RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods={"refl": "bilinear"}
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array([[4, nan, nan], [0, 2, 0], [3, 0, 4]]),
    )

    target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods={"refl": 1}
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array([[1.25, 1.5, nan], [1.0, 1.25, 1.5], [1.75, 1.0, 1.25]]),
    )


def test_different_geographic_crses(source_ds, source_gm):
    expected = np.array([[1.25, 1.5, nan], [1.0, 1.25, 1.5], [1.75, 1.0, 1.25]])

    target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, CRS_WGS84)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(target_ds.refl.values, expected)

    target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, CRS_CRS84)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(target_ds.refl.values, expected)

    target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, CRS.from_epsg(3035))
    with pytest.raises(AssertionError) as excinfo:
        affine_transform_dataset(source_ds, target_gm, source_gm=source_gm)
    assert (
        "Affine transformation cannot be applied to source CRS 'WGS 84' "
        "and target CRS 'ETRS89-extended / LAEA Europe'" in str(excinfo.value)
    )


def test_downscale_x2(source_ds, source_gm):
    target_gm = GridMapping.regular((8, 6), (50, 10), 2 * RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    assert (6, 8) == target_ds.refl.shape
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [0.75, 1.0, 1.75, 1.25, nan, nan, nan, nan],
                [1.25, 1.0, 1.25, 1.75, nan, nan, nan, nan],
                [1.75, 1.25, 0.75, 1.25, nan, nan, nan, nan],
            ]
        ),
    )


def test_downscale_x2_and_shift(source_ds, source_gm):
    target_gm = GridMapping.regular((8, 6), (49.8, 9.8), 2 * RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [nan, 0.75, 1.0, 1.75, 1.25, nan, nan, nan],
                [nan, 1.25, 1.0, 1.25, 1.75, nan, nan, nan],
                [nan, 1.75, 1.25, 0.75, 1.25, nan, nan, nan],
                [nan, nan, nan, nan, nan, nan, nan, nan],
            ]
        ),
    )


def test_upscale_x2(source_ds, source_gm):
    target_gm = GridMapping.regular((8, 6), (50, 10), RES / 2, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [1.0, 0.5, 0.0, 1.0, 2.0, 1.0, 0.0, 1.5],
                [0.5, 1.0, 1.5, 1.25, 1.0, 1.5, 2.0, 1.75],
                [0.0, 1.5, 3.0, 1.5, 0.0, 2.0, 4.0, 2.0],
                [2.0, 1.75, 1.5, 1.0, 0.5, 1.25, 2.0, 1.5],
                [4.0, 2.0, 0.0, 0.5, 1.0, 0.5, 0.0, 1.0],
                [nan, nan, nan, nan, nan, nan, nan, nan],
            ]
        ),
    )


def test_upscale_x2_and_shift(source_ds, source_gm):
    target_gm = GridMapping.regular((8, 6), (49.9, 9.95), RES / 2, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [nan, nan, 0.5, 1.0, 1.5, 1.25, 1.0, 1.5],
                [nan, nan, 0.0, 1.5, 3.0, 1.5, 0.0, 2.0],
                [nan, nan, 2.0, 1.75, 1.5, 1.0, 0.5, 1.25],
                [nan, nan, 4.0, 2.0, 0.0, 0.5, 1.0, 0.5],
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [nan, nan, nan, nan, nan, nan, nan, nan],
            ]
        ),
    )


def test_shift(source_ds, source_gm):
    target_gm = GridMapping.regular((8, 6), (50.2, 10.1), RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [nan, nan, nan, nan, nan, nan, nan, nan],
                [0.0, 2.0, 0.0, 3.0, 0.0, 4.0, nan, nan],
                [nan, nan, 4.0, 0.0, 1.0, 0.0, nan, nan],
                [nan, nan, 0.0, 2.0, 0.0, 3.0, nan, nan],
                [2.0, 0.0, 3.0, 0.0, 4.0, 0.0, nan, nan],
                [0.0, 4.0, 0.0, 1.0, 0.0, 2.0, nan, nan],
            ]
        ),
    )

    target_gm = GridMapping.regular((8, 6), (49.8, 9.9), RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, source_gm=source_gm, interp_methods=1
    )
    _assert_vars(source_ds, target_ds)
    np.testing.assert_almost_equal(
        target_ds.refl.values,
        np.array(
            [
                [nan, nan, 2.0, 0.0, nan, nan, 4.0, 0.0],
                [nan, nan, 0.0, 4.0, nan, nan, 0.0, 2.0],
                [nan, nan, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0],
                [nan, nan, 0.0, 3.0, 0.0, 4.0, 0.0, 1.0],
                [nan, nan, 4.0, 0.0, 1.0, 0.0, 2.0, 0.0],
                [nan, nan, nan, nan, nan, nan, nan, nan],
            ]
        ),
    )


def test_affine_raise_value_error(source_ds, source_gm):
    target_gm = GridMapping.regular((8, 6), (50.2, 10.1), RES, source_gm.crs)
    with pytest.raises(ValueError) as excinfo:
        affine_transform_dataset(
            source_ds, target_gm, source_gm=source_gm, interp_methods=3
        )
    assert (
        "interp_methods must be one of 0, 1, 'nearest', 'bilinear'. "
        "Higher order is not supported for 3D arrays in affine transforms, "
        "as it causes unintended blending across the non-spatial (e.g., time) "
        "dimension." in str(excinfo.value)
    )


# -- j-axis-up handling ------------------------------------------------------
# The reference flips j-up sources only in reproject (reference
# reproject.py:115-118), never in affine, so a j-up source silently shifts
# every row by one through the corner-composed matrix.  Neither test suite
# upstream covers this; these tests assert the corrected behavior.


def _create_j_up_8x8_dataset():
    res = 0.1
    data = (8.0 * np.arange(8)[:, None] + np.arange(8)[None, :]).astype(
        np.float64
    )
    return Dataset(
        data_vars=dict(band=DataArray(data, dims=("lat", "lon"))),
        coords=dict(
            lon=DataArray(50.0 + res * np.arange(8) + 0.5 * res, dims="lon"),
            # ascending latitude = j axis up
            lat=DataArray(10.0 + res * np.arange(8) + 0.5 * res, dims="lat"),
        ),
    )


def test_j_up_source_identity_flip():
    source_ds = _create_j_up_8x8_dataset()
    source_gm = GridMapping.from_dataset(source_ds)
    assert source_gm.is_j_axis_up
    target_gm = GridMapping.regular((8, 8), (50.0, 10.0), RES, source_gm.crs)
    target_ds = affine_transform_dataset(source_ds, target_gm, interp_methods=1)
    # bit-exact row reversal: no NaN edge row, no one-row shift
    np.testing.assert_array_equal(
        target_ds.band.values, source_ds.band.values[::-1]
    )


def test_j_up_source_downscale_x2_mean():
    source_ds = _create_j_up_8x8_dataset()
    source_gm = GridMapping.from_dataset(source_ds)
    assert source_gm.is_j_axis_up
    target_gm = GridMapping.regular((4, 4), (50.0, 10.0), 2 * RES, source_gm.crs)
    target_ds = affine_transform_dataset(
        source_ds, target_gm, interp_methods=1, agg_methods="mean"
    )
    # hand-computed 2x2 window means of the j-down twin: no NaN edge row
    # silently absorbed, no wrong row pairs
    expected = 52.5 - 16.0 * np.arange(4)[:, None] + 2.0 * np.arange(4)[None, :]
    np.testing.assert_allclose(target_ds.band.values, expected)


def test_j_up_target_identity_flip(source_ds, source_gm):
    target_gm = GridMapping.regular(
        (8, 6), (50.0, 10.0), RES, source_gm.crs, is_j_axis_up=True
    )
    # nearest: bilinear would spread the fixture's NaN to zero-weight
    # neighbours (reference interpolation semantics), which is not what
    # this test is about
    target_ds = affine_transform_dataset(source_ds, target_gm, interp_methods=0)
    np.testing.assert_array_equal(
        target_ds.refl.values, source_ds.refl.values[::-1]
    )
    # the assigned y coordinate is ascending, matching the j-up target
    assert target_ds.lat.values[0] < target_ds.lat.values[-1]


def test_j_up_source_downscale_flipped_axis_aggregates():
    # a flipped downscale axis must still take the aggregation split
    # (the gate uses abs(scale)); compare against the j-down twin
    source_ds = _create_j_up_8x8_dataset()
    target_gm = GridMapping.regular((4, 4), (50.0, 10.0), 2 * RES, CRS_WGS84)
    flipped = affine_transform_dataset(
        source_ds, target_gm, interp_methods=1, agg_methods="mean"
    )
    j_down = Dataset(
        data_vars=dict(
            band=DataArray(source_ds.band.values[::-1], dims=("lat", "lon"))
        ),
        coords=dict(
            lon=source_ds.lon,
            lat=DataArray(source_ds.lat.values[::-1], dims="lat"),
        ),
    )
    straight = affine_transform_dataset(
        j_down, target_gm, interp_methods=1, agg_methods="mean"
    )
    np.testing.assert_array_equal(flipped.band.values, straight.band.values)
