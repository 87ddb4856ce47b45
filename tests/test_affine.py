"""Affine engine goldens (port of reference tests/test_affine.py)."""

import numpy as np
import pytest

from xcube_resampling_tpu.affine import affine_transform_dataset
from xcube_resampling_tpu.crs import CRS, CRS_CRS84, CRS_WGS84
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.xrlite import Dataset

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
