"""CF grid-mapping discovery (port of reference test_cfconv.py)."""

import warnings

import numpy as np
import pytest

from xcube_resampling_tpu import zarrlite
from xcube_resampling_tpu.crs import CRS
from xcube_resampling_tpu.gridmapping.cfconv import (
    GridCoords,
    GridMappingProxy,
    _find_potential_coord_vars,
    add_spatial_ref,
    get_dataset_grid_mapping_proxies,
)
from xcube_resampling_tpu.xrlite import DataArray, Dataset

CRS_WGS84 = CRS.from_epsg(4326)
CRS_CRS84 = CRS.from_string("urn:ogc:def:crs:OGC:1.3:CRS84")
CRS_UTM_33N = CRS.from_epsg(32633)

CRS_ROTATED_POLE = CRS.from_cf(
    dict(
        grid_mapping_name="rotated_latitude_longitude",
        grid_north_pole_latitude=32.5,
        grid_north_pole_longitude=170.0,
    )
)


def _assert_single_proxy(grid_mappings, key, crs, name, x_name, y_name):
    assert 1 == len(grid_mappings)
    assert key in grid_mappings
    grid_mapping = grid_mappings.get(key)
    assert isinstance(grid_mapping, GridMappingProxy)
    if crs is not None:
        assert crs == grid_mapping.crs
    if name is not None:
        assert name == grid_mapping.name
    assert isinstance(grid_mapping.coords, GridCoords)
    assert isinstance(grid_mapping.coords.x, DataArray)
    assert isinstance(grid_mapping.coords.y, DataArray)
    assert x_name == grid_mapping.coords.x.name
    assert y_name == grid_mapping.coords.y.name
    return grid_mapping


def test_no_crs_lon_lat_common_names():
    dataset = Dataset(
        coords=dict(
            lon=DataArray(np.linspace(10, 12, 11), dims="lon"),
            lat=DataArray(np.linspace(50, 52, 11), dims="lat"),
        )
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    _assert_single_proxy(
        grid_mappings, None, CRS_WGS84, "latitude_longitude", "lon", "lat"
    )


def test_no_crs_lon_lat_standard_names():
    dataset = Dataset(
        coords=dict(
            weird_x=DataArray(
                np.linspace(10, 12, 11),
                dims="i",
                attrs=dict(standard_name="longitude"),
            ),
            weird_y=DataArray(
                np.linspace(50, 52, 11),
                dims="j",
                attrs=dict(standard_name="latitude"),
            ),
        )
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    _assert_single_proxy(
        grid_mappings, None, CRS_WGS84, "latitude_longitude", "weird_x", "weird_y"
    )


def test_crs_x_y_with_common_names():
    dataset = Dataset(
        dict(crs=DataArray(np.array(0), dims=(), attrs=CRS_UTM_33N.to_cf())),
        coords=dict(
            x=DataArray(np.linspace(1000, 12000, 11), dims="x"),
            y=DataArray(np.linspace(5000, 52000, 11), dims="y"),
        ),
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    _assert_single_proxy(
        grid_mappings, "crs", CRS_UTM_33N, "transverse_mercator", "x", "y"
    )


def test_crs_x_y_with_standard_names():
    dataset = Dataset(
        dict(crs=DataArray(np.array(0), dims=(), attrs=CRS_UTM_33N.to_cf())),
        coords=dict(
            myx=DataArray(
                np.linspace(1000, 12000, 11),
                dims="x",
                attrs=dict(standard_name="projection_x_coordinate"),
            ),
            myy=DataArray(
                np.linspace(5000, 52000, 11),
                dims="y",
                attrs=dict(standard_name="projection_y_coordinate"),
            ),
        ),
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    _assert_single_proxy(
        grid_mappings, "crs", CRS_UTM_33N, "transverse_mercator", "myx", "myy"
    )


def test_latitude_longitude_with_x_y():
    # Mirrors a CRS-84 GeoTIFF opened with rioxarray
    dataset = Dataset(
        dict(
            band_1=DataArray(np.zeros((11, 11)), dims=("y", "x")),
            spatial_ref=DataArray(np.array(0), dims=(), attrs=CRS_CRS84.to_cf()),
        ),
        coords=dict(
            x=DataArray(np.linspace(10, 20, 11), dims="x"),
            y=DataArray(np.linspace(50, 40, 11), dims="y"),
        ),
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    _assert_single_proxy(
        grid_mappings, "spatial_ref", None, "latitude_longitude", "x", "y"
    )


def test_crs_in_attrs():
    wkt = CRS_WGS84.to_wkt()
    attrs = CRS_WGS84.to_cf()
    attrs["crs_wkt"] = wkt
    dataset = Dataset(
        coords=dict(
            lon=DataArray(np.linspace(10, 12, 11), dims="lon"),
            lat=DataArray(np.linspace(50, 52, 11), dims="lat"),
        ),
        attrs=attrs,
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    _assert_single_proxy(
        grid_mappings, None, CRS_WGS84, "latitude_longitude", "lon", "lat"
    )


def test_emit_warning():
    dataset = Dataset(
        coords=dict(
            lon=DataArray([10], dims="lon"),
            lat=DataArray([50], dims="lat"),
        ),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _ = get_dataset_grid_mapping_proxies(dataset, emit_warnings=True)
    assert len(w) == 1
    assert "missing x- and/or y-coordinates" in str(w[0].message)


def test_rotated_pole_with_common_names():
    dataset = Dataset(
        dict(
            rotated_pole=DataArray(
                np.array(0), dims=(), attrs=CRS_ROTATED_POLE.to_cf()
            )
        ),
        coords=dict(
            rlon=DataArray(np.linspace(-180, 180, 11), dims="rlon"),
            rlat=DataArray(np.linspace(0, 90, 11), dims="rlat"),
        ),
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    gm = _assert_single_proxy(grid_mappings, "rotated_pole", None, None, "rlon", "rlat")
    assert "Geographic" in gm.crs.type_name


def test_rotated_pole_with_standard_names():
    dataset = Dataset(
        dict(
            rotated_pole=DataArray(
                np.array(0), dims=(), attrs=CRS_ROTATED_POLE.to_cf()
            )
        ),
        coords=dict(
            u=DataArray(
                np.linspace(-180, 180, 11),
                dims="u",
                attrs=dict(standard_name="grid_longitude"),
            ),
            v=DataArray(
                np.linspace(0, 90, 11),
                dims="v",
                attrs=dict(standard_name="grid_latitude"),
            ),
        ),
    )
    grid_mappings = get_dataset_grid_mapping_proxies(dataset)
    gm = _assert_single_proxy(grid_mappings, "rotated_pole", None, None, "u", "v")
    assert "Geographic" in gm.crs.type_name


def test_bounds_detection():
    dataset = Dataset(
        coords={
            "lon": DataArray(np.linspace(0, 10, 5), dims="lon"),
            "lat": DataArray(np.linspace(0, 5, 5), dims="lat"),
            "lon_bnds": DataArray(np.linspace(0, 10, 10), dims="bnds"),
            "lat_bounds": DataArray(np.linspace(0, 5, 10), dims="bnds"),
            "alt": DataArray(np.linspace(0, 100, 5), dims="alt"),
        }
    )
    dataset["lat"].attrs["bounds"] = "lat_bounds"
    # note: xrlite Dataset __getitem__ copies, so mutate the stored coord
    dataset.coords["lat"].attrs["bounds"] = "lat_bounds"

    potential_vars = _find_potential_coord_vars(dataset)

    assert "lon" in potential_vars
    assert "lat" in potential_vars
    assert "alt" in potential_vars
    assert "lon_bnds" not in potential_vars
    assert "lat_bounds" not in potential_vars


def test_coordinates_in_attribute():
    dataset = Dataset(
        {
            "x": DataArray([0, 1], dims="x"),
            "y": DataArray([0, 1], dims="y"),
        },
        attrs={"coordinates": "x y"},
    )
    result = _find_potential_coord_vars(dataset)
    assert "x" in result
    assert "y" in result


def test_var_not_in_dataset():
    dataset = Dataset(
        coords={
            "lon": DataArray(np.linspace(0, 10, 5), dims="lon"),
            "lat": DataArray(np.linspace(0, 5, 5), dims="lat"),
        }
    )
    # names in the CF global "coordinates" attribute that are absent from
    # the dataset must be ignored
    dataset.attrs["coordinates"] = "missing_var lon"
    result = _find_potential_coord_vars(dataset)
    assert "missing_var" not in result
    assert result[0] == "lon"


class TestAddSpatialRef:
    def setup_method(self):
        self.store = zarrlite.MemoryStore()
        self.group = zarrlite.group(store=self.store, overwrite=True)
        self.group.zeros("data", shape=(3, 3), chunks=(3, 3), dtype=np.float32)
        self.group["data"].attrs["_ARRAY_DIMENSIONS"] = ["y", "x"]

    def test_add_spatial_ref_creates_variable(self):
        crs = CRS.from_epsg(4326)
        add_spatial_ref(self.store, crs, crs_var_name="spatial_ref_test")

        assert "spatial_ref_test" in self.group
        spatial_ref = self.group["spatial_ref_test"]
        assert spatial_ref.shape == ()
        assert spatial_ref.attrs
        assert "_ARRAY_DIMENSIONS" in spatial_ref.attrs
        assert spatial_ref.attrs["_ARRAY_DIMENSIONS"] == []

    def test_add_grid_mapping_attribute(self):
        crs = CRS.from_epsg(4326)
        add_spatial_ref(
            self.store, crs, crs_var_name="spatial_ref_test", xy_dim_names=("x", "y")
        )
        assert self.group["data"].attrs.get("grid_mapping") == "spatial_ref_test"


# ---------------------------------------------------------------------------
# CF coordinate round trip through a zarr store
# (reference tests/gridmapping/test_cfconv.py:335-380 — xarray's
# decode_cf promotion semantics, on the zarrlite/xrlite store path.
# Deviation: this framework promotes grid-mapping variables named
# ``crs``/``spatial_ref`` to coordinates on open, where plain
# xarray.open_zarr keeps them as data variables.)
# ---------------------------------------------------------------------------


def _gen_cf_1d():
    rng = np.random.default_rng(3)
    noise = DataArray(rng.random((11, 11)), dims=("lat", "lon"))
    crs = DataArray(np.array(0), dims=(), attrs=CRS.from_epsg(4326).to_cf())
    lon = DataArray(np.linspace(10, 12, 11), dims=("lon",))
    lat = DataArray(np.linspace(50, 52, 11), dims=("lat",))
    return noise, crs, lon, lat


def _gen_cf_2d():
    rng = np.random.default_rng(3)
    noise = DataArray(rng.random((11, 11)), dims=("y", "x"))
    crs = DataArray(np.array(0), dims=(), attrs=CRS.from_epsg(4326).to_cf())
    lon2, lat2 = np.meshgrid(np.linspace(10, 12, 11), np.linspace(50, 52, 11))
    lon = DataArray(lon2, dims=("y", "x"))
    lat = DataArray(lat2, dims=("y", "x"))
    return noise, crs, lon, lat


def _roundtrip(ds):
    store = zarrlite.MemoryStore()
    zarrlite.write_dataset(ds, store)
    out = zarrlite.open_dataset(store)
    return set(out.data_vars), set(out.coords)


def test_cf_1d_coords():
    noise, crs, lon, lat = _gen_cf_1d()
    data_vars, coords = _roundtrip(
        Dataset(dict(noise=noise, crs=crs), coords=dict(lon=lon, lat=lat))
    )
    assert data_vars == {"noise"}
    assert coords == {"lon", "lat", "crs"}


def test_cf_1d_data_vars():
    noise, crs, lon, lat = _gen_cf_1d()
    data_vars, coords = _roundtrip(
        Dataset(dict(noise=noise, crs=crs, lon=lon, lat=lat))
    )
    # 1-D vars named like their dimension are coordinates by convention
    assert data_vars == {"noise"}
    assert coords == {"lon", "lat", "crs"}


def test_cf_2d_coords():
    noise, crs, lon, lat = _gen_cf_2d()
    data_vars, coords = _roundtrip(
        Dataset(dict(noise=noise, crs=crs), coords=dict(lon=lon, lat=lat))
    )
    # the writer records the CF ``coordinates`` attribute, so the 2-D
    # lon/lat keep their coordinate status through the store
    assert data_vars == {"noise"}
    assert coords == {"lon", "lat", "crs"}


def test_cf_2d_data_vars():
    noise, crs, lon, lat = _gen_cf_2d()
    data_vars, coords = _roundtrip(
        Dataset(dict(noise=noise, crs=crs, lon=lon, lat=lat))
    )
    # written as plain data variables, 2-D lon/lat stay data variables
    assert data_vars == {"noise", "lon", "lat"}
    assert coords == {"crs"}
