"""xarray <-> xrlite interop adapter tests (skipped when xarray is absent)."""

import numpy as np
import pytest

xr = pytest.importorskip("xarray")

from xcube_resampling_tpu import interop, xrlite


def _xr_dataset():
    rng = np.random.default_rng(0)
    lon = np.linspace(10.0, 11.0, 8)
    lat = np.linspace(54.0, 53.0, 6)
    return xr.Dataset(
        data_vars={
            "sst": xr.DataArray(
                rng.random((6, 8), dtype=np.float32) + 280.0,
                dims=("lat", "lon"),
                attrs={"units": "K"},
            ),
            "mask": xr.DataArray(
                rng.integers(0, 2, (6, 8), dtype=np.uint8), dims=("lat", "lon")
            ),
        },
        coords={
            "lon": xr.DataArray(lon, dims="lon", attrs={"units": "degrees_east"}),
            "lat": xr.DataArray(lat, dims="lat", attrs={"units": "degrees_north"}),
        },
        attrs={"title": "demo"},
    )


def test_from_xarray_round_trip():
    src = _xr_dataset()
    lite = interop.from_xarray(src)
    assert isinstance(lite, xrlite.Dataset)
    assert set(lite.data_vars) == {"sst", "mask"}
    assert set(lite.coords) == {"lon", "lat"}
    assert lite.attrs == {"title": "demo"}
    assert lite["sst"].dims == ("lat", "lon")
    assert lite["sst"].attrs["units"] == "K"
    np.testing.assert_array_equal(lite["sst"].values, src["sst"].values)
    np.testing.assert_array_equal(lite.coords["lat"].values, src["lat"].values)

    back = interop.to_xarray(lite)
    assert isinstance(back, xr.Dataset)
    assert back.attrs == src.attrs
    for name in ("sst", "mask"):
        np.testing.assert_array_equal(back[name].values, src[name].values)
        assert back[name].dims == src[name].dims
        assert dict(back[name].attrs) == dict(src[name].attrs)
    np.testing.assert_array_equal(back["lon"].values, src["lon"].values)
    assert back["lon"].attrs["units"] == "degrees_east"


def test_from_xarray_preserves_dask_chunks_as_metadata():
    src = _xr_dataset().chunk({"lat": 3, "lon": 4})
    lite = interop.from_xarray(src)
    assert lite["sst"].chunksizes == {"lat": (3, 3), "lon": (4, 4)}
    # data is materialized, not lazy
    assert isinstance(lite["sst"].data, np.ndarray)


def test_resample_accepts_converted_dataset():
    """A converted xarray dataset flows through the public resampling API."""
    from xcube_resampling_tpu import resample_in_space
    from xcube_resampling_tpu.gridmapping import GridMapping

    src = _xr_dataset()
    lite = interop.from_xarray(src)
    target_gm = GridMapping.regular(
        size=(8, 6), xy_min=(10.0, 53.0), xy_res=1.0 / 7, crs="epsg:4326"
    )
    out = resample_in_space(lite, target_gm=target_gm)
    assert "sst" in out.data_vars
    back = interop.to_xarray(out)
    assert back["sst"].shape == (6, 8)
