"""GridMapping.transform behaviour (port of reference test_transform.py,
including the pyproj-derived sub-micrometer goldens for CRS84 -> UTM32N)."""

import numpy as np
import pytest

from xcube_resampling_tpu.crs import CRS, CRS_CRS84, CRS_WGS84
from xcube_resampling_tpu.gridmapping import GridMapping

from ..sampledata import create_s2plus_dataset

CRS_UTM_32N = CRS.from_epsg(32632)


def test_transform():
    gm = GridMapping.regular(size=(3, 3), xy_min=(10, 53), xy_res=0.1, crs=CRS_CRS84)
    gm_t = gm.transform(crs=CRS_UTM_32N)

    assert CRS_UTM_32N == gm_t.crs
    assert gm_t.is_regular is False
    assert ("transformed_x", "transformed_y") == gm_t.xy_var_names
    assert ("lon", "lat") == gm_t.xy_dim_names
    np.testing.assert_almost_equal(
        np.array(
            [
                [570057.076286, 576728.9360228, 583400.7295284],
                [570220.3304187, 576907.7404859, 583595.0849538],
                [570383.3684844, 577086.3083212, 583789.1831954],
            ]
        ),
        np.asarray(gm_t.xy_coords.data[0]),
    )
    np.testing.assert_almost_equal(
        np.array(
            [
                [5900595.928991, 5900698.5746648, 5900810.5532744],
                [5889471.9033896, 5889574.6540572, 5889686.7472201],
                [5878348.0594403, 5878450.9138481, 5878563.1201969],
            ]
        ),
        np.asarray(gm_t.xy_coords.data[1]),
    )


def test_transform_xy_var_names():
    gm = GridMapping.regular(size=(3, 3), xy_min=(10, 53), xy_res=0.1, crs=CRS_CRS84)
    gm_t = gm.transform(crs=CRS_UTM_32N, xy_var_names=("x", "y"))
    assert CRS_UTM_32N == gm_t.crs
    assert ("x", "y") == gm_t.xy_var_names
    assert ("lon", "lat") == gm_t.xy_dim_names


def test_transform_s2():
    dataset = create_s2plus_dataset()

    gm = GridMapping.from_dataset(dataset, prefer_is_regular=True)
    # the projected grid mapping is the regular one
    assert "Projected" in gm.crs.type_name
    assert gm.is_regular is True

    gm_t = gm.transform(CRS_CRS84)
    assert CRS_CRS84 == gm_t.crs

    gm_t = gm.transform(CRS_WGS84)
    assert CRS_WGS84 == gm_t.crs


def test_transform_no_op():
    dataset = create_s2plus_dataset()

    gm = GridMapping.from_dataset(dataset, prefer_is_regular=True)
    assert "Projected" in gm.crs.type_name
    assert gm.is_regular is True

    gm_t = gm.transform(gm.crs)
    assert gm_t is gm

    # Almost no-op
    gm = GridMapping.regular(size=(3, 3), xy_min=(10, 53), xy_res=0.1, crs=CRS_CRS84)
    gm_t = gm.transform(crs=gm.crs, xy_var_names=("x", "y"))
    assert ("x", "y") == gm_t.xy_var_names
