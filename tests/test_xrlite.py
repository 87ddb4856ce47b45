"""Dedicated xrlite data-model tests (the xarray-replacement layer).

The behaviors pinned here are the xarray semantics the engines rely on:
view/attrs sharing through ``Dataset.__getitem__``, chunk-metadata
propagation through slicing, named-dim arithmetic with broadcasting, and
coordinate handling (reference parity surface: xarray as used throughout
xcube_resampling/*.py)."""

import numpy as np
import pytest

from xcube_resampling_tpu.xrlite import DataArray, Dataset
from xcube_resampling_tpu.xrlite.dataarray import broadcast, concat


def _da():
    return DataArray(
        np.arange(24, dtype=np.float64).reshape(2, 3, 4),
        dims=("time", "y", "x"),
        attrs={"units": "K"},
        name="t",
        chunks=(1, 2, 2),
    )


# ---------------------------------------------------------------- DataArray


def test_dataarray_basics():
    da = _da()
    assert da.dims == ("time", "y", "x")
    assert da.shape == (2, 3, 4)
    assert da.sizes == {"time": 2, "y": 3, "x": 4}
    assert da.dtype == np.float64
    assert da.attrs["units"] == "K"
    assert da.chunks == ((1, 1), (2, 1), (2, 2))
    assert da.chunksizes == {"time": (1, 1), "y": (2, 1), "x": (2, 2)}


def test_dataarray_getitem_preserves_chunk_metadata():
    da = _da()
    sub = da[:, 0:2, 1:4]
    assert sub.shape == (2, 2, 3)
    assert sub.chunks is not None
    assert sub.chunks[0] == (1, 1)
    assert sub.chunks[1][0] == 2


def test_dataarray_isel_and_expand_dims():
    da = _da()
    s = da.isel(time=0)
    assert s.dims == ("y", "x") and s.shape == (3, 4)
    s2 = da.isel(y=slice(1, 3), x=2)
    assert s2.dims == ("time", "y") and s2.shape == (2, 2)
    e = s.expand_dims({"band": 2})
    assert e.dims == ("band", "y", "x") and e.shape == (2, 3, 4)
    np.testing.assert_array_equal(e.values[0], e.values[1])


def test_dataarray_arithmetic_broadcasts_by_dim_name():
    a = DataArray(np.arange(3.0), dims=("y",))
    b = DataArray(np.arange(4.0), dims=("x",))
    c = a + b
    assert c.dims == ("y", "x") and c.shape == (3, 4)
    np.testing.assert_array_equal(
        c.values, np.arange(3.0)[:, None] + np.arange(4.0)[None, :]
    )
    d = a * 2 - 1
    np.testing.assert_array_equal(d.values, np.arange(3.0) * 2 - 1)
    assert ((a < 2).values == [True, True, False]).all()


def test_dataarray_transpose_where_astype():
    da = _da()
    t = da.transpose("x", "time", "y")
    assert t.dims == ("x", "time", "y") and t.shape == (4, 2, 3)
    w = da.where(da > 5.0)
    assert np.isnan(w.values).sum() == 6
    assert da.astype(np.float32).dtype == np.float32


def test_dataarray_reductions_and_diff():
    da = _da()
    assert float(da.min()) == 0.0 and float(da.max()) == 23.0
    assert float(da.mean()) == pytest.approx(11.5)
    d = da.diff("x")
    assert d.shape == (2, 3, 3)
    assert (d.values == 1.0).all()


def test_broadcast_and_concat():
    a = DataArray(np.zeros((3,)), dims=("y",))
    b = DataArray(np.ones((2, 3)), dims=("t", "y"))
    a2, b2 = broadcast(a, b)
    # xarray orders broadcast dims by first appearance across args
    assert a2.dims == b2.dims == ("y", "t")
    assert a2.shape == b2.shape == (3, 2)
    c = concat([DataArray(np.zeros((2, 2)), dims=("y", "x")),
                DataArray(np.ones((2, 2)), dims=("y", "x"))], dim="y")
    assert c.shape == (4, 2)


# ------------------------------------------------------------------ Dataset


def _ds():
    return Dataset(
        dict(
            band=DataArray(
                np.arange(12.0).reshape(3, 4), dims=("y", "x"),
                attrs={"grid_mapping": "spatial_ref"},
            )
        ),
        coords=dict(
            x=np.arange(4.0),
            y=np.arange(3.0),
            spatial_ref=DataArray(np.array(0), dims=(), attrs={"epsg": 4326}),
        ),
        attrs={"title": "t"},
    )


def test_dataset_getitem_returns_shared_view():
    """xarray parity: ds[name] shares attrs/data with the stored variable,
    so mutations through the view are visible in the dataset."""
    ds = _ds()
    view = ds["band"]
    view.attrs["flag"] = 1
    assert ds.data_vars["band"].attrs["flag"] == 1


def test_dataset_dims_sizes_contains_iter():
    ds = _ds()
    assert ds.dims == {"y": 3, "x": 4}
    assert "band" in ds and "x" in ds
    assert set(iter(ds)) >= {"band"}
    assert set(ds.coords) == {"x", "y", "spatial_ref"}


def test_dataset_isel_slices_vars_and_coords():
    ds = _ds()
    sub = ds.isel(y=slice(1, 3), x=slice(0, 2))
    assert sub.band.shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(sub.coords["y"].data), [1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(sub.coords["x"].data), [0.0, 1.0])
    # scalar coords survive
    assert "spatial_ref" in sub.coords


def test_dataset_sel_by_coordinate_value():
    ds = _ds()
    sub = ds.sel(x=slice(1.0, 2.0))
    assert sub.band.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(sub.coords["x"].data), [1.0, 2.0])


def test_dataset_copy_rename_drop_set_coords():
    ds = _ds()
    cp = ds.copy()
    cp.data_vars["band"].attrs["new"] = 1
    assert "new" not in ds.data_vars["band"].attrs

    rn = ds.rename({"band": "b2"})
    assert "b2" in rn.data_vars and "band" not in rn.data_vars

    dv = ds.drop_vars("band")
    assert "band" not in dv.data_vars
    with pytest.raises(Exception):
        ds.drop_vars("missing")
    assert "missing" not in ds.drop_vars("missing", errors="ignore").data_vars

    ds2 = _ds()
    ds2["aux"] = DataArray(np.zeros(4), dims=("x",))
    ds3 = ds2.set_coords("aux")
    assert "aux" in ds3.coords and "aux" not in ds3.data_vars


def test_dataset_assign_coords_and_chunk():
    ds = _ds()
    ds2 = ds.assign_coords(band_idx=DataArray(np.array(3), dims=()))
    assert "band_idx" in ds2.coords
    ch = ds.chunk({"y": 2, "x": 2})
    assert ch.data_vars["band"].chunks == ((2, 1), (2, 2))


def test_dataset_attrs_roundtrip():
    ds = _ds()
    assert ds.attrs["title"] == "t"
    ds.attrs = {"title": "u"}
    assert ds.attrs["title"] == "u"
