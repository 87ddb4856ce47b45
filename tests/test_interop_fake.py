"""Exercise the interop adapter logic with a minimal xarray stand-in.

The real-xarray round-trip lives in test_interop.py and skips when xarray is
absent; this file drives the same conversion code against a duck-typed fake
so the adapter's dims/attrs/chunks handling is covered in every environment.
"""

import sys
import types

import numpy as np
import pytest


class _FakeVar:
    def __init__(self, data, dims, attrs=None, chunks=None):
        self.values = np.asarray(data)
        self.dims = tuple(dims)
        self.attrs = dict(attrs or {})
        self.chunks = chunks  # dask-style tuple of per-dim block tuples


class _FakeDataset:
    def __init__(self, data_vars, coords, attrs):
        self.data_vars = data_vars
        self.coords = coords
        self.attrs = attrs


@pytest.fixture()
def fake_xarray(monkeypatch):
    """Install a stub xarray module capturing to_xarray constructor calls."""
    mod = types.ModuleType("xarray")

    class DataArray:
        def __init__(self, data, dims=None, attrs=None, name=None):
            self.values = np.asarray(data)
            self.dims = tuple(dims)
            self.attrs = dict(attrs or {})
            self.name = name

    class Dataset:
        def __init__(self, data_vars=None, coords=None, attrs=None):
            self.data_vars = dict(data_vars or {})
            self.coords = dict(coords or {})
            self.attrs = dict(attrs or {})

    mod.DataArray = DataArray
    mod.Dataset = Dataset
    monkeypatch.setitem(sys.modules, "xarray", mod)
    return mod


def test_from_xarray_with_fake(fake_xarray):
    from xcube_resampling_tpu import interop

    src = _FakeDataset(
        data_vars={
            "sst": _FakeVar(
                np.arange(12.0, dtype=np.float32).reshape(3, 4),
                ("lat", "lon"),
                {"units": "K"},
                chunks=((2, 1), (4,)),
            )
        },
        coords={
            "lon": _FakeVar(np.linspace(0, 3, 4), ("lon",)),
            "lat": _FakeVar(np.linspace(2, 0, 3), ("lat",)),
        },
        attrs={"title": "fake"},
    )
    lite = interop.from_xarray(src)
    assert lite.attrs == {"title": "fake"}
    assert lite["sst"].dims == ("lat", "lon")
    assert lite["sst"].attrs == {"units": "K"}
    # leading dask block sizes become the xrlite tile layout
    assert lite["sst"].chunksizes == {"lat": (2, 1), "lon": (4,)}
    np.testing.assert_array_equal(lite["sst"].values, src.data_vars["sst"].values)
    np.testing.assert_array_equal(lite.coords["lat"].values, [2.0, 1.0, 0.0])


def test_to_xarray_with_fake(fake_xarray):
    from xcube_resampling_tpu import interop, xrlite

    lite = xrlite.Dataset(
        data_vars={"b": (("y", "x"), np.ones((2, 3), np.float32), {"n": 1})},
        coords={"x": np.arange(3.0), "y": np.arange(2.0)},
        attrs={"k": "v"},
    )
    out = interop.to_xarray(lite)
    assert isinstance(out, fake_xarray.Dataset)
    assert out.attrs == {"k": "v"}
    assert out.data_vars["b"].dims == ("y", "x")
    assert out.data_vars["b"].attrs == {"n": 1}
    np.testing.assert_array_equal(out.data_vars["b"].values, np.ones((2, 3)))
    np.testing.assert_array_equal(out.coords["x"].values, np.arange(3.0))
