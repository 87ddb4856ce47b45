"""GridMapping.from_coords behaviour (port of reference test_coords.py)."""

import numpy as np
import pytest

from xcube_resampling_tpu.crs import CRS
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.xrlite import DataArray

GEO_CRS = CRS.from_epsg(4326)
NOT_A_GEO_CRS = CRS.from_epsg(5243)


def test_1d_j_axis_down():
    x_coords = DataArray(np.linspace(1.5, 8.5, 8), dims="lon")
    y_coords = DataArray(np.linspace(4.5, -4.5, 10), dims="lat")
    gm = GridMapping.from_coords(x_coords=x_coords, y_coords=y_coords, crs=GEO_CRS)
    assert (8, 10) == gm.size
    assert (8, 10) == gm.tile_size
    assert (1, 1) == gm.xy_res
    assert (1, -5, 9, 5) == gm.xy_bbox
    assert GEO_CRS == gm.crs
    assert gm.is_regular is True
    assert gm.is_j_axis_up is False
    assert gm.is_lon_360 is False
    assert gm.x_coords is x_coords
    assert gm.y_coords is y_coords


def test_1d_j_axis_up():
    gm = GridMapping.from_coords(
        x_coords=DataArray(np.linspace(1.5, 8.5, 8), dims="lon"),
        y_coords=DataArray(np.linspace(-4.5, 4.5, 10), dims="lat"),
        crs=GEO_CRS,
    )
    assert (8, 10) == gm.size
    assert (1, 1) == gm.xy_res
    assert (1, -5, 9, 5) == gm.xy_bbox
    assert gm.is_regular is True
    assert gm.is_j_axis_up is True
    assert gm.is_lon_360 is False


def test_1d_lon_360():
    gm = GridMapping.from_coords(
        x_coords=DataArray(np.linspace(177.5, 184.5, 8), dims="lon"),
        y_coords=DataArray(np.linspace(4.5, -4.5, 10), dims="lat"),
        crs=GEO_CRS,
    )
    assert (8, 10) == gm.size
    assert (1, 1) == gm.xy_res
    assert (177, -5, 185, 5) == gm.xy_bbox
    assert gm.is_regular is True
    assert gm.is_j_axis_up is False
    assert gm.is_lon_360 is True


def test_1d_anti_meridian():
    lon = np.linspace(177.5, 184.5, 8)
    lon = np.where(lon > 180, lon - 360, lon)
    gm = GridMapping.from_coords(
        x_coords=DataArray(lon, dims="lon"),
        y_coords=DataArray(np.linspace(4.5, -4.5, 10), dims="lat"),
        crs=GEO_CRS,
    )
    assert (8, 10) == gm.size
    assert (1, 1) == gm.xy_res
    assert (177, -5, 185, 5) == gm.xy_bbox
    assert gm.is_regular is True
    assert gm.is_j_axis_up is False
    assert gm.is_lon_360 is True


def test_1d_tiles_given():
    gm = GridMapping.from_coords(
        x_coords=DataArray(np.linspace(177.5, 184.5, 8), dims="lon"),
        y_coords=DataArray(np.linspace(4.5, -4.5, 10), dims="lat"),
        crs=GEO_CRS,
        tile_size=(5, 3),
    )
    assert (8, 10) == gm.size
    assert (5, 3) == gm.tile_size
    assert (177, -5, 185, 5) == gm.xy_bbox
    assert gm.is_lon_360 is True


def test_1d_tiles_from_coords_chunks():
    gm = GridMapping.from_coords(
        x_coords=DataArray(np.linspace(177.5, 184.5, 8), dims="lon", chunks=(4,)),
        y_coords=DataArray(np.linspace(4.5, -4.5, 10), dims="lat", chunks=(5,)),
        crs=GEO_CRS,
    )
    assert (8, 10) == gm.size
    assert (4, 5) == gm.tile_size
    assert (177, -5, 185, 5) == gm.xy_bbox
    assert gm.is_regular is True


def test_1d_x_irregular():
    gm = GridMapping.from_coords(
        x_coords=DataArray([1.5, 2.5, 3.5, 4.5, 5.49, 6.5, 7.5, 8.5], dims="lon"),
        y_coords=DataArray(np.linspace(4.5, -4.5, 10), dims="lat"),
        crs=GEO_CRS,
    )
    assert (8, 10) == gm.size
    assert (1, 1) == gm.xy_res
    assert (1, -5, 9, 5) == gm.xy_bbox
    assert gm.is_regular is False
    assert gm.is_j_axis_up is False
    assert gm.is_lon_360 is False


def test_1d_xy_coords():
    gm = GridMapping.from_coords(
        x_coords=DataArray(np.linspace(1.5, 8.5, 8), dims="lon"),
        y_coords=DataArray(np.linspace(4.5, -4.5, 10), dims="lat"),
        crs=GEO_CRS,
    )
    xy_coords = gm.xy_coords
    assert isinstance(xy_coords, DataArray)
    assert xy_coords is gm.xy_coords
    assert ("coord", "lat", "lon") == xy_coords.dims
    assert (2, 10, 8) == xy_coords.shape
    assert ("lon", "lat") == gm.xy_var_names
    assert ("lon", "lat") == gm.xy_dim_names


def test_to_coords():
    gm = GridMapping.regular(
        size=(10, 6), xy_min=(-2600.0, 1200.0), xy_res=10.0, crs=NOT_A_GEO_CRS
    )
    cv = gm.to_coords(reuse_coords=False)
    assert "x" in cv
    assert "y" in cv
    assert np.float64 == cv["x"].dtype
    assert np.float64 == cv["y"].dtype

    gm2 = GridMapping.from_coords(
        cv["x"].astype(np.float32), cv["y"].astype(np.float32), gm.crs
    )
    cv2 = gm2.to_coords(
        xy_var_names=("a", "b"), xy_dim_names=("u", "v"), reuse_coords=True
    )
    assert "a" in cv2
    assert "b" in cv2
    assert np.dtype(np.float32) == cv2["a"].dtype
    assert np.dtype(np.float32) == cv2["b"].dtype


def test_2d():
    x_coords = DataArray(
        [
            [10.0, 10.1, 10.2, 10.3],
            [10.1, 10.2, 10.3, 10.4],
            [10.2, 10.3, 10.4, 10.5],
        ],
        dims=("lat", "lon"),
    )
    y_coords = DataArray(
        [
            [52.0, 52.2, 52.4, 52.6],
            [52.2, 52.4, 52.6, 52.8],
            [52.4, 52.6, 52.8, 53.0],
        ],
        dims=("lat", "lon"),
    )
    gm = GridMapping.from_coords(x_coords=x_coords, y_coords=y_coords, crs=GEO_CRS)
    assert (4, 3) == gm.size
    assert (4, 3) == gm.tile_size
    assert (0.3, 0.3) == gm.xy_res
    assert (9.85, 51.85, 10.65, 53.15) == gm.xy_bbox
    assert gm.is_regular is False
    assert gm.is_j_axis_up is True
    assert gm.is_lon_360 is False
    assert gm.x_coords is x_coords
    assert gm.y_coords is y_coords


def test_2d_tile_size_from_chunks():
    gm = GridMapping.from_coords(
        x_coords=DataArray(
            [
                [10.0, 10.1, 10.2, 10.3],
                [10.1, 10.2, 10.3, 10.4],
                [10.2, 10.3, 10.4, 10.5],
            ],
            dims=("lat", "lon"),
            chunks=(2, 3),
        ),
        y_coords=DataArray(
            [
                [52.0, 52.2, 52.4, 52.6],
                [52.2, 52.4, 52.6, 52.8],
                [52.4, 52.6, 52.8, 53.0],
            ],
            dims=("lat", "lon"),
            chunks=(2, 3),
        ),
        crs=GEO_CRS,
    )
    assert (4, 3) == gm.size
    assert (3, 2) == gm.tile_size


def test_2d_regular():
    gm = GridMapping.from_coords(
        x_coords=DataArray(
            [
                [10.2, 10.3, 10.4, 10.5],
                [10.2, 10.3, 10.4, 10.5],
                [10.2, 10.3, 10.4, 10.5],
            ],
            dims=("lat", "lon"),
        ),
        y_coords=DataArray(
            [
                [52.4, 52.4, 52.4, 52.4],
                [52.6, 52.6, 52.6, 52.6],
                [52.8, 52.8, 52.8, 52.8],
            ],
            dims=("lat", "lon"),
        ),
        crs=GEO_CRS,
    )
    assert (4, 3) == gm.size
    assert gm.x_res == pytest.approx(0.1)
    assert gm.y_res == pytest.approx(0.2)
    assert gm.x_min == pytest.approx(10.15)
    assert gm.y_min == pytest.approx(52.3)
    assert gm.x_max == pytest.approx(10.55)
    assert gm.y_max == pytest.approx(52.9)
    assert gm.is_regular is True
    assert gm.is_j_axis_up is True
    assert gm.is_lon_360 is False


def test_2d_anti_meridian():
    gm = GridMapping.from_coords(
        x_coords=DataArray(
            [
                [+177.5, +178.5, +179.5, -179.5],
                [+178.5, +179.5, -179.5, -178.5],
                [+179.5, -179.5, -178.5, -177.5],
            ],
            dims=("lat", "lon"),
        ),
        y_coords=DataArray(
            [
                [52.4, 52.4, 52.4, 52.4],
                [52.6, 52.6, 52.6, 52.6],
                [52.8, 52.8, 52.8, 52.8],
            ],
            dims=("lat", "lon"),
        ),
        crs=GEO_CRS,
    )
    assert (4, 3) == gm.size
    assert gm.x_res == pytest.approx(0.2)
    assert gm.y_res == pytest.approx(0.2)
    assert (177.4, 52.3, 182.6, 52.9) == gm.xy_bbox
    assert gm.is_regular is False
    assert gm.is_j_axis_up is True
    assert gm.is_lon_360 is True


def test_to_regular():
    lon = DataArray([[1.0, 6.0], [0.0, 2.0]], dims=("y", "x"))
    lat = DataArray([[56.0, 53.0], [52.0, 50.0]], dims=("y", "x"))

    gm_irr = GridMapping.from_coords(lon, lat, GEO_CRS)
    gm_reg_actual = gm_irr.to_regular()
    gm_reg_expected = GridMapping.regular(
        size=(4, 4), tile_size=(2, 2), xy_min=(-2, 48), xy_res=4.0, crs=GEO_CRS
    )
    assert gm_reg_expected.size == gm_reg_actual.size
    assert gm_reg_expected.tile_size == gm_reg_actual.tile_size
    assert gm_reg_expected.xy_res == gm_reg_actual.xy_res
    assert gm_reg_expected.xy_bbox == gm_reg_actual.xy_bbox
    assert gm_reg_expected.crs == gm_reg_actual.crs


def test_2d_xy_coords():
    gm = GridMapping.from_coords(
        x_coords=DataArray(
            [
                [10.0, 10.1, 10.2, 10.3],
                [10.1, 10.2, 10.3, 10.4],
                [10.2, 10.3, 10.4, 10.5],
            ],
            dims=("lat", "lon"),
        ),
        y_coords=DataArray(
            [
                [52.0, 52.2, 52.4, 52.6],
                [52.2, 52.4, 52.6, 52.8],
                [52.4, 52.6, 52.8, 53.0],
            ],
            dims=("lat", "lon"),
        ),
        crs=GEO_CRS,
    )
    xy_coords = gm.xy_coords
    assert isinstance(xy_coords, DataArray)
    assert xy_coords is gm.xy_coords
    assert ("coord", "lat", "lon") == xy_coords.dims
    assert (2, 3, 4) == xy_coords.shape
    assert ("lon", "lat") == gm.xy_var_names
    assert ("lon", "lat") == gm.xy_dim_names


def _nan_edged_swath_coords(width=16, height=12):
    """Gently curved swath with non-finite corner pixels — the normal
    shape of real OLCI/SLSTR L2 products."""
    j = np.arange(height, dtype=np.float64)[:, np.newaxis]
    i = np.arange(width, dtype=np.float64)[np.newaxis, :]
    res = 0.01
    lon = 4.0 + res * (i + 0.12 * j)
    lat = 62.0 - res * (j - 0.08 * i)
    for jj, ii in ((0, 0), (0, 1), (1, 0), (-1, -1), (0, -1), (-1, 0)):
        lon[jj, ii] = np.nan
        lat[jj, ii] = np.nan
    return (
        DataArray(lon, dims=("y", "x")),
        DataArray(lat, dims=("y", "x")),
    )


def test_2d_nan_edge_coords_bbox():
    # NaN edge pixels must not poison the inferred bbox (the reference's
    # scans are NaN-skipping, reference gridmapping/bboxes.py:143-166)
    lon, lat = _nan_edged_swath_coords()
    gm = GridMapping.from_coords(lon, lat, GEO_CRS)
    assert gm.is_regular is False
    x1, y1, x2, y2 = gm.xy_bbox
    assert np.isfinite([x1, y1, x2, y2]).all()
    # bbox covers the hull of all finite coordinates
    assert x1 <= np.nanmin(lon.values) and x2 >= np.nanmax(lon.values)
    assert y1 <= np.nanmin(lat.values) and y2 >= np.nanmax(lat.values)


def test_2d_bowed_swath_bbox_covers_hull():
    # Strongly bowed swath: the true x-minimum lies mid-edge of an
    # INTERIOR column, where an edge-only scan cannot see it.
    width, height = 20, 14
    j = np.arange(height, dtype=np.float64)[:, np.newaxis]
    i = np.arange(width, dtype=np.float64)[np.newaxis, :]
    lon = 10.0 + 0.002 * (i - width / 2) ** 2 + 0.01 * j
    lat = 50.0 + 0.002 * (j - height / 2) ** 2 + 0.01 * i
    gm = GridMapping.from_coords(
        DataArray(lon, dims=("y", "x")),
        DataArray(lat, dims=("y", "x")),
        GEO_CRS,
    )
    x1, y1, x2, y2 = gm.xy_bbox
    assert x1 <= lon.min() and x2 >= lon.max()
    assert y1 <= lat.min() and y2 >= lat.max()


def test_2d_all_nan_coords_clear_error():
    nan2d = np.full((4, 5), np.nan)
    with pytest.raises(
        (ValueError, RuntimeError),
        match="finite values|could not be determined",
    ):
        GridMapping.from_coords(
            DataArray(nan2d, dims=("y", "x")),
            DataArray(nan2d, dims=("y", "x")),
            GEO_CRS,
        )
