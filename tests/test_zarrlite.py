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
