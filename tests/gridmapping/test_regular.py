"""RegularGridMapping behaviour (port of reference test_regular.py)."""

import numpy as np
import pytest

from xcube_resampling_tpu.crs import CRS, CRS_WGS84
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.gridmapping.regular import RegularGridMapping
from xcube_resampling_tpu.xrlite import DataArray

GEO_CRS = CRS.from_epsg(4326)
NOT_A_GEO_CRS = CRS.from_epsg(5243)


def test_default_props():
    gm = GridMapping.regular((1000, 1000), (10, 53), 0.01, CRS_WGS84)
    assert (1000, 1000) == gm.size
    assert (1000, 1000) == gm.tile_size
    assert 10 == gm.x_min
    assert 53 == gm.y_min
    assert (0.01, 0.01) == gm.xy_res
    assert gm.is_regular is True
    assert gm.is_j_axis_up is False


def test_invalid_y():
    with pytest.raises(ValueError, match="invalid y_min"):
        GridMapping.regular((1000, 1000), (10, -90.5), 0.01, CRS_WGS84)

    with pytest.raises(ValueError, match="invalid size, y_min combination"):
        GridMapping.regular((1000, 1000), (10, 53), 0.1, CRS_WGS84)


def test_xy_bbox():
    gm = GridMapping.regular((1000, 1000), (10, 53), 0.01, CRS_WGS84)
    assert (10, 53, 20, 63) == gm.xy_bbox
    assert gm.is_lon_360 is False


def test_xy_bbox_anti_meridian():
    gm = GridMapping.regular((2000, 1000), (174.0, -30.0), 0.005, CRS_WGS84)
    assert (174.0, -30.0, 184.0, -25.0) == gm.xy_bbox
    assert gm.is_lon_360 is True


def test_derive():
    gm = GridMapping.regular((1000, 1000), (10, 53), 0.01, CRS_WGS84)
    derived_gm = gm.derive(tile_size=500, is_j_axis_up=True)
    assert derived_gm is not gm
    assert isinstance(derived_gm, RegularGridMapping)
    assert (1000, 1000) == derived_gm.size
    assert (500, 500) == derived_gm.tile_size
    assert derived_gm.is_j_axis_up is True


def test_xy_coords():
    gm = GridMapping.regular((8, 4), (10, 53), 0.1, CRS_WGS84).derive(tile_size=(4, 2))
    xy_coords = gm.xy_coords
    assert isinstance(xy_coords, DataArray)
    assert gm.xy_coords is xy_coords
    assert ("coord", "lat", "lon") == xy_coords.dims
    assert (2, 4, 8) == xy_coords.shape
    assert ((2,), (2, 2), (4, 4)) == xy_coords.chunks
    np.testing.assert_almost_equal(
        np.broadcast_to(
            np.array([10.05, 10.15, 10.25, 10.35, 10.45, 10.55, 10.65, 10.75]), (4, 8)
        ),
        xy_coords.values[0],
    )
    np.testing.assert_almost_equal(
        np.broadcast_to(np.array([[53.35], [53.25], [53.15], [53.05]]), (4, 8)),
        xy_coords.values[1],
    )


def test_xy_names():
    gm = GridMapping.regular((1000, 1000), (10, 53), 0.01, GEO_CRS).derive(
        tile_size=500
    )
    assert ("lon", "lat") == gm.xy_var_names
    assert ("lon", "lat") == gm.xy_dim_names
    gm = GridMapping.regular((1000, 1000), (10, 53), 0.01, NOT_A_GEO_CRS).derive(
        tile_size=500
    )
    assert ("x", "y") == gm.xy_var_names
    assert ("x", "y") == gm.xy_dim_names


def test_ij_bboxes():
    gm = GridMapping.regular(
        size=(2000, 1000), xy_min=(10.0, 20.0), xy_res=0.1, crs=NOT_A_GEO_CRS
    )
    np.testing.assert_almost_equal(
        gm.ij_bboxes, np.array([[0, 0, 2000, 1000]], dtype=np.int64)
    )

    gm = gm.derive(tile_size=500)
    np.testing.assert_almost_equal(
        gm.ij_bboxes,
        np.array(
            [
                [0, 0, 500, 500],
                [500, 0, 1000, 500],
                [1000, 0, 1500, 500],
                [1500, 0, 2000, 500],
                [0, 500, 500, 1000],
                [500, 500, 1000, 1000],
                [1000, 500, 1500, 1000],
                [1500, 500, 2000, 1000],
            ],
            dtype=np.int64,
        ),
    )


def test_xy_bboxes_tiles():
    gm = GridMapping.regular(
        size=(2000, 1000), xy_min=(10.0, 20.0), xy_res=0.1, crs=NOT_A_GEO_CRS
    )
    np.testing.assert_almost_equal(
        gm.xy_bboxes, np.array([[10.0, 20.0, 210.0, 120.0]], dtype=np.float64)
    )

    gm = gm.derive(tile_size=500)
    np.testing.assert_almost_equal(
        gm.xy_bboxes,
        np.array(
            [
                [10.0, 70, 60, 120.0],
                [60.0, 70, 110, 120.0],
                [110.0, 70, 160, 120.0],
                [160.0, 70, 210, 120.0],
                [10.0, 20, 60, 70.0],
                [60.0, 20, 110, 70.0],
                [110.0, 20, 160, 70.0],
                [160.0, 20, 210, 70.0],
            ],
            dtype=np.float64,
        ),
    )


def test_xy_bboxes_is_j_axis_up():
    gm = GridMapping.regular(
        size=(2000, 1000), xy_min=(10.0, 20.0), xy_res=0.1, crs=NOT_A_GEO_CRS
    ).derive(is_j_axis_up=True)
    np.testing.assert_almost_equal(
        gm.xy_bboxes, np.array([[10.0, 20.0, 210.0, 120.0]], dtype=np.float64)
    )

    gm = GridMapping.regular(
        size=(2000, 1000), xy_min=(10.0, 20.0), xy_res=0.1, crs=NOT_A_GEO_CRS
    ).derive(tile_size=500, is_j_axis_up=True)
    np.testing.assert_almost_equal(
        gm.xy_bboxes,
        np.array(
            [
                [10.0, 20.0, 60.0, 70.0],
                [60.0, 20.0, 110.0, 70.0],
                [110.0, 20.0, 160.0, 70.0],
                [160.0, 20.0, 210.0, 70.0],
                [10.0, 70.0, 60.0, 120.0],
                [60.0, 70.0, 110.0, 120.0],
                [110.0, 70.0, 160.0, 120.0],
                [160.0, 70.0, 210.0, 120.0],
            ],
            dtype=np.float64,
        ),
    )


def _assert_coord_vars(
    cv, size, xy_names, x_values, y_values, xy_bnds_names, x_bnds_values, y_bnds_values
):
    assert cv is not None
    assert xy_names[0] in cv
    assert xy_names[1] in cv
    assert xy_bnds_names[0] in cv
    assert xy_bnds_names[1] in cv

    x = cv[xy_names[0]]
    assert (size[0],) == x.shape
    np.testing.assert_almost_equal(x.values[0], np.array(x_values[0]))
    np.testing.assert_almost_equal(x.values[-1], np.array(x_values[-1]))

    y = cv[xy_names[1]]
    assert (size[1],) == y.shape
    np.testing.assert_almost_equal(y.values[0], np.array(y_values[0]))
    np.testing.assert_almost_equal(y.values[-1], np.array(y_values[-1]))

    x_bnds = cv[xy_bnds_names[0]]
    assert (size[0], 2) == x_bnds.shape
    np.testing.assert_almost_equal(x_bnds.values[0], np.array(x_bnds_values[0]))
    np.testing.assert_almost_equal(x_bnds.values[-1], np.array(x_bnds_values[-1]))

    y_bnds = cv[xy_bnds_names[1]]
    assert (size[1], 2) == y_bnds.shape
    np.testing.assert_almost_equal(y_bnds.values[0], y_bnds_values[0])
    np.testing.assert_almost_equal(y_bnds.values[-1], y_bnds_values[-1])


def test_to_coords():
    gm = GridMapping.regular(
        size=(10, 6), xy_min=(-2600.0, 1200.0), xy_res=10.0, crs=NOT_A_GEO_CRS
    )
    cv = gm.to_coords(xy_var_names=("x", "y"))
    _assert_coord_vars(
        cv,
        (10, 6),
        ("x", "y"),
        (-2595.0, -2505.0),
        (1255.0, 1205.0),
        ("x_bnds", "y_bnds"),
        ((-2600.0, -2590.0), (-2510.0, -2500.0)),
        ((1260.0, 1250.0), (1210.0, 1200.0)),
    )


def test_coord_vars_j_axis_up():
    gm = GridMapping.regular(
        size=(10, 6), xy_min=(-2600.0, 1200.0), xy_res=10.0, crs=NOT_A_GEO_CRS
    ).derive(is_j_axis_up=True)
    cv = gm.to_coords(xy_var_names=("x", "y"))
    _assert_coord_vars(
        cv,
        (10, 6),
        ("x", "y"),
        (-2595.0, -2505.0),
        (1205.0, 1255.0),
        ("x_bnds", "y_bnds"),
        ((-2600.0, -2590.0), (-2510.0, -2500.0)),
        ((1200.0, 1210.0), (1250.0, 1260.0)),
    )


def test_coord_vars_antimeridian():
    gm = GridMapping.regular(
        size=(10, 10), xy_min=(172.0, 53.0), xy_res=2.0, crs=GEO_CRS
    )
    cv = gm.to_coords(xy_var_names=("lon", "lat"))
    _assert_coord_vars(
        cv,
        (10, 10),
        ("lon", "lat"),
        (173.0, -169.0),
        (72.0, 54.0),
        ("lon_bnds", "lat_bnds"),
        ((172.0, 174.0), (-170.0, -168.0)),
        ((73.0, 71.0), (55.0, 53.0)),
    )


def test_to_regular():
    gm = GridMapping.regular((1000, 1000), (10, 53), 0.01, CRS_WGS84)
    gm_test = gm.to_regular()
    assert gm_test.size == (1000, 1000)
    assert gm_test.tile_size == (1000, 1000)
    assert gm_test.crs == CRS_WGS84
    assert gm_test.xy_res == (0.01, 0.01)
    assert not gm_test.is_j_axis_up

    gm_test = gm.to_regular(tile_size=500)
    assert gm_test.size == (1000, 1000)
    assert gm_test.tile_size == (500, 500)
    assert gm_test.xy_res == (0.01, 0.01)
    assert not gm_test.is_j_axis_up

    gm_test = gm.to_regular(is_j_axis_up=True)
    assert gm_test.size == (1000, 1000)
    assert gm_test.tile_size == (1000, 1000)
    assert gm_test.xy_res == (0.01, 0.01)
    assert gm_test.is_j_axis_up
