"""GridMapping.from_dataset behaviour (port of reference test_dataset.py).

The reference's real-OLCI test opened a large binary zarr sample stripped
from this mirror; it is replaced by the synthetic OLCI-like swath generator
(tests/sampledata.py:create_olci_like_swath) with equivalent assertions on
size, tiling, CRS, resolution estimation and regularization.
"""

import numpy as np
import pytest

from xcube_resampling_tpu.crs import CRS
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.xrlite import DataArray, Dataset

from ..sampledata import create_olci_like_swath, create_s2plus_dataset

GEO_CRS = CRS.from_epsg(4326)
NOT_A_GEO_CRS = CRS.from_epsg(5243)


def test_from_non_regular_cube():
    lon = np.array(
        [[8, 9.3, 10.6, 11.9], [8, 9.2, 10.4, 11.6], [8, 9.1, 10.2, 11.3]],
        dtype=np.float32,
    )
    lat = np.array(
        [[56, 56.1, 56.2, 56.3], [55, 55.2, 55.4, 55.6], [54, 54.3, 54.6, 54.9]],
        dtype=np.float32,
    )
    rad = np.random.random(3 * 4).reshape((3, 4))
    dims = ("y", "x")
    dataset = Dataset(
        dict(
            lon=DataArray(lon, dims=dims),
            lat=DataArray(lat, dims=dims),
            rad=DataArray(rad, dims=dims),
        )
    )
    gm = GridMapping.from_dataset(dataset)
    assert (4, 3) == gm.size
    assert (4, 3) == gm.tile_size
    assert GEO_CRS == gm.crs
    assert gm.is_regular is False
    assert gm.is_lon_360 is False
    assert gm.is_j_axis_up is False
    assert (2, 3, 4) == gm.xy_coords.shape
    assert ("coord", "y", "x") == gm.xy_coords.dims
    assert (0.8, 0.8) == gm.xy_res


def test_crs():
    ds = Dataset(
        {
            "var": (("lat", "lon"), np.random.rand(2, 2)),
        },
        coords={
            "lon": ("lon", [0, 1]),
            "lat": ("lat", [0, 1]),
        },
    )

    result = GridMapping.from_dataset(ds, crs="EPSG:4326")
    assert result.is_regular
    assert result.crs.to_string() == "EPSG:4326"


def test_from_synthetic_olci():
    dataset = create_olci_like_swath()
    gm = GridMapping.from_dataset(dataset)
    assert (1189, 1890) == gm.size
    assert (512, 512) == gm.tile_size
    assert GEO_CRS == gm.crs
    assert (0.0025, 0.0025) == gm.xy_res
    assert gm.is_regular is False
    assert gm.is_lon_360 is False
    assert gm.is_j_axis_up is False
    assert (2, 1890, 1189) == gm.xy_coords.shape
    assert ("coord", "y", "x") == gm.xy_coords.dims

    gm_reg = gm.to_regular()
    # regularized grid must cover the swath at the estimated resolution
    w, h = gm_reg.size
    x_min, y_min, x_max, y_max = gm.xy_bbox
    assert w == round((x_max - x_min + 0.0025) / 0.0025)
    assert h == round((y_max - y_min + 0.0025) / 0.0025)


def test_from_sentinel_2():
    dataset = create_s2plus_dataset()
    tol = 1e-6

    gm = GridMapping.from_dataset(dataset, tolerance=tol)
    assert "Projected" in gm.crs.type_name
    assert gm.is_regular is True

    gm = GridMapping.from_dataset(dataset, prefer_is_regular=True, tolerance=tol)
    assert "Projected" in gm.crs.type_name
    assert gm.is_regular is True

    gm = GridMapping.from_dataset(dataset, prefer_is_regular=False, tolerance=tol)
    assert "Geographic" in gm.crs.type_name
    assert gm.is_regular is False

    gm = GridMapping.from_dataset(dataset, prefer_crs=GEO_CRS, tolerance=tol)
    assert "Geographic" in gm.crs.type_name
    assert gm.is_regular is False

    gm = GridMapping.from_dataset(
        dataset, prefer_crs=GEO_CRS, prefer_is_regular=True, tolerance=tol
    )
    assert "Geographic" in gm.crs.type_name
    assert gm.is_regular is False


def test_no_grid_mapping_found():
    with pytest.raises(ValueError, match="cannot find any grid mapping in dataset"):
        GridMapping.from_dataset(Dataset())


def test_broken_candidate_tolerated():
    # A proxy whose 2D coord images are unusable (all-NaN — e.g. produced
    # by resampling near a swath edge) must not take down inference when
    # a healthy regular proxy exists.  The reference gets this for free
    # from lazy dask bboxes (reference gridmapping/dataset.py:72-100).
    nan2d = np.full((4, 5), np.nan)
    dataset = Dataset(
        dict(
            band=DataArray(
                np.zeros((4, 5), dtype=np.float32),
                dims=("y", "x"),
                attrs=dict(grid_mapping="crs"),
            ),
            crs=DataArray(
                np.array(0), dims=(), attrs=CRS.from_epsg(32632).to_cf()
            ),
        ),
        coords=dict(
            x=DataArray(
                np.arange(5, dtype=np.float64) * 10.0 + 5.0,
                dims="x",
                attrs=dict(standard_name="projection_x_coordinate", units="m"),
            ),
            y=DataArray(
                np.arange(4, dtype=np.float64) * -10.0 + 100.0,
                dims="y",
                attrs=dict(standard_name="projection_y_coordinate", units="m"),
            ),
            lon=DataArray(
                nan2d, dims=("y", "x"),
                attrs=dict(standard_name="longitude", units="degrees_east"),
            ),
            lat=DataArray(
                nan2d, dims=("y", "x"),
                attrs=dict(standard_name="latitude", units="degrees_north"),
            ),
        ),
    )
    gm = GridMapping.from_dataset(dataset)
    assert gm.is_regular is True
    assert gm.size == (5, 4)
