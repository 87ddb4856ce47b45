"""zarrlite storage layer: round trips, tile-granular resume, consolidation."""

import numpy as np
import pytest

from xcube_resampling_tpu import zarrlite
from xcube_resampling_tpu.crs import CRS
from xcube_resampling_tpu.xrlite import DataArray, Dataset


def _make_ds():
    h, w = 13, 17
    data = np.arange(h * w, dtype=np.float32).reshape(h, w)
    ds = Dataset(
        dict(band=DataArray(data, dims=("y", "x"), attrs={"units": "1"})),
        coords=dict(
            x=np.linspace(0.0, 16.0, w),
            y=np.linspace(12.0, 0.0, h),
            spatial_ref=DataArray(
                np.array(0), dims=(), attrs=CRS.from_epsg(4326).to_cf()
            ),
        ),
        attrs={"title": "t"},
    )
    return ds.chunk({"y": 5, "x": 8})


def test_dataset_roundtrip_memory_store():
    ds = _make_ds()
    store = zarrlite.MemoryStore()
    zarrlite.write_dataset(ds, store)
    back = zarrlite.open_dataset(store)
    assert back.attrs["title"] == "t"
    assert set(back.data_vars) == {"band"}
    assert "x" in back.coords and "y" in back.coords and "spatial_ref" in back.coords
    np.testing.assert_array_equal(back.band.values, ds.band.values)
    assert back.band.attrs["units"] == "1"
    assert back.band.chunks == ((5, 5, 3), (8, 8, 1))
    # CF attrs survive so GridMapping.from_dataset works on the reopened set
    from xcube_resampling_tpu.gridmapping import GridMapping

    gm = GridMapping.from_dataset(back)
    assert gm.crs.is_geographic


def test_dataset_roundtrip_directory_store(tmp_path):
    ds = _make_ds()
    path = tmp_path / "test.zarr"
    zarrlite.write_dataset(ds, str(path), compressor="zlib")
    back = zarrlite.open_dataset(str(path))
    np.testing.assert_array_equal(back.band.values, ds.band.values)
    assert (path / ".zmetadata").is_file()


def test_tile_granular_resume():
    """Interrupted tiled computations resume by recomputing only missing
    chunks (the rebuild's checkpoint/resume story, SURVEY.md §5)."""
    store = zarrlite.MemoryStore()
    g = zarrlite.group(store)
    arr = g.create_array(
        "out", shape=(10, 12), dtype=np.float32, chunks=(5, 6), fill_value=np.nan
    )
    # simulate a job that wrote 3 of 4 tiles then died
    full = np.arange(120, dtype=np.float32).reshape(10, 12)
    for idx in [(0, 0), (0, 1), (1, 0)]:
        sl = (slice(idx[0] * 5, idx[0] * 5 + 5), slice(idx[1] * 6, idx[1] * 6 + 6))
        arr.write_tile(full[sl], idx)

    assert arr.has_tile((0, 0))
    assert not arr.has_tile((1, 1))

    # resume: only the missing tile is recomputed
    recomputed = []
    for idx in np.ndindex(2, 2):
        if not arr.has_tile(idx):
            sl = (
                slice(idx[0] * 5, idx[0] * 5 + 5),
                slice(idx[1] * 6, idx[1] * 6 + 6),
            )
            arr.write_tile(full[sl], idx)
            recomputed.append(idx)
    assert recomputed == [(1, 1)]
    np.testing.assert_array_equal(arr.read(), full)


def test_scalar_array_and_attrs():
    store = zarrlite.MemoryStore()
    g = zarrlite.group(store)
    a = g.array("crs", 0, shape=(), dtype=np.uint8)
    a.attrs["grid_mapping_name"] = "latitude_longitude"
    assert g["crs"].attrs["grid_mapping_name"] == "latitude_longitude"
    assert int(g["crs"].read()) == 0


def test_consolidate_metadata():
    store = zarrlite.MemoryStore()
    g = zarrlite.group(store)
    g.zeros("a", shape=(4, 4), chunks=(2, 2), dtype=np.float32)
    zarrlite.consolidate_metadata(store)
    import json

    meta = json.loads(store[".zmetadata"].decode())
    assert "a/.zarray" in meta["metadata"]


class _CountingStore(zarrlite.MemoryStore):
    """MemoryStore that counts per-key reads (chunk-laziness probe)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read_keys = []

    def get(self, key, default=None):
        if key in self:
            self.read_keys.append(key)
        return super().get(key, default)


def test_read_window_partial_chunks():
    store = zarrlite.MemoryStore()
    g = zarrlite.group(store)
    data = np.arange(100 * 120, dtype=np.float32).reshape(100, 120)
    arr = g.create_array("v", data.shape, data.dtype, chunks=(32, 48))
    arr.write(data)
    for sl in (
        (slice(0, 10), slice(0, 10)),
        (slice(30, 70), slice(40, 100)),
        (slice(95, 100), slice(110, 120)),
        (slice(0, 100), slice(0, 120)),
        (slice(50, 50), slice(0, 5)),
    ):
        np.testing.assert_array_equal(arr.read_window(sl), data[sl])


def test_lazy_array_indexing_and_chunk_reads():
    store = _CountingStore()
    g = zarrlite.group(store)
    data = np.arange(128 * 128, dtype=np.float32).reshape(128, 128)
    arr = g.create_array("v", data.shape, data.dtype, chunks=(32, 32))
    arr.write(data)
    lazy = zarrlite.LazyArray(g["v"])
    assert lazy.shape == (128, 128) and lazy.dtype == np.float32

    store.read_keys.clear()
    np.testing.assert_array_equal(lazy[10:20, 5:40], data[10:20, 5:40])
    chunk_reads = [k for k in store.read_keys if k.startswith("v/") and ".z" not in k]
    assert len(chunk_reads) == 2  # one chunk row, two chunk cols

    np.testing.assert_array_equal(lazy[5], data[5])
    np.testing.assert_array_equal(lazy[..., 3], data[..., 3])
    np.testing.assert_array_equal(lazy[-1, -1], data[-1, -1])
    np.testing.assert_array_equal(np.asarray(lazy), data)
    # fancy indexing falls back to materialization but stays correct
    np.testing.assert_array_equal(lazy[[3, 7], :], data[[3, 7], :])


def test_open_dataset_lazy_roundtrip():
    from xcube_resampling_tpu.xrlite import DataArray, Dataset

    store = zarrlite.MemoryStore()
    data = np.random.default_rng(0).random((64, 64)).astype(np.float32)
    ds = Dataset(
        dict(band=DataArray(data, dims=("y", "x"), chunks=(16, 16))),
        coords=dict(
            x=np.arange(64, dtype=np.float64),
            y=np.arange(64, dtype=np.float64),
        ),
    )
    zarrlite.write_dataset(ds, store)
    lazy_ds = zarrlite.open_dataset(store, lazy=True)
    assert isinstance(lazy_ds.band.data, zarrlite.LazyArray)
    np.testing.assert_array_equal(lazy_ds.band.values, data)
    sub = lazy_ds.isel(y=slice(4, 12), x=slice(0, 8))
    assert isinstance(sub.band.data, np.ndarray)
    np.testing.assert_array_equal(sub.band.values, data[4:12, 0:8])


def test_round_trip_2d_coords_swath():
    """2D lat/lon coordinate variables survive write/open and the reopened
    dataset still infers an irregular (swath) grid mapping — the rebuild's
    analogue of the reference's xarray decode_cf coordinate-role probes
    (reference tests/gridmapping/test_cfconv.py:330-399)."""
    from xcube_resampling_tpu.gridmapping import GridMapping
    from xcube_resampling_tpu.xrlite import DataArray, Dataset

    yy, xx = np.mgrid[0:12, 0:11].astype(np.float64)
    lon = 10.0 + 0.2 * xx + 0.01 * yy
    lat = 50.0 + 0.2 * yy - 0.01 * xx
    noise = np.random.default_rng(0).random((12, 11)).astype(np.float32)
    ds = Dataset(
        dict(noise=DataArray(noise, dims=("y", "x"),
                             attrs={"grid_mapping": "crs"})),
        coords=dict(
            lon=DataArray(lon, dims=("y", "x"),
                          attrs={"standard_name": "longitude"}),
            lat=DataArray(lat, dims=("y", "x"),
                          attrs={"standard_name": "latitude"}),
            crs=DataArray(np.array(0), dims=(),
                          attrs=CRS.from_epsg(4326).to_cf()),
        ),
    )
    gm = GridMapping.from_dataset(ds)
    assert not gm.is_regular

    store = zarrlite.MemoryStore()
    zarrlite.write_dataset(ds, store)
    back = zarrlite.open_dataset(store)
    assert back.noise.shape == (12, 11)
    np.testing.assert_allclose(np.asarray(back.lon.data), lon)
    # 2D coord vars come back as data vars (no 1D dim-name match);
    # re-marking them as coords restores grid-mapping inference
    back = back.set_coords([n for n in ("lon", "lat", "crs") if n in back.data_vars])
    gm2 = GridMapping.from_dataset(back)
    assert not gm2.is_regular
    assert gm2.crs.to_epsg() == 4326
    np.testing.assert_allclose(gm2.xy_bbox, gm.xy_bbox)
