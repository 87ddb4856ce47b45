"""Out-of-core streaming executor: tile-by-tile resample into a store with
resume, results identical to the in-memory engine."""

import numpy as np
import pytest

from xcube_resampling_tpu import zarrlite
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.parallel.stream import resample_to_store
from xcube_resampling_tpu.spatial import resample_in_space

from .sampledata import create_5x5_dataset_regular_utm


def _case():
    source_ds = create_5x5_dataset_regular_utm()
    target_gm = GridMapping.regular(
        size=(6, 6),
        xy_min=(4320040, 3382440),
        xy_res=80,
        crs="epsg:3035",
        tile_size=4,
    )
    return source_ds, target_gm


def test_stream_matches_engine():
    source_ds, target_gm = _case()
    store = zarrlite.MemoryStore()
    n = resample_to_store(source_ds, target_gm, store, interp_methods=0)
    assert n == 4  # 2x2 tiles

    ref = resample_in_space(
        source_ds, target_gm=target_gm.derive(tile_size=(6, 6)), interp_methods=0
    )
    back = zarrlite.open_dataset(store)
    np.testing.assert_array_equal(back.band_1.values, ref.band_1.values)
    assert back["band_1"].attrs.get("grid_mapping") == "spatial_ref"
    assert "x" in back.coords and "y" in back.coords


def test_stream_resume_skips_done_tiles():
    source_ds, target_gm = _case()
    store = zarrlite.MemoryStore()
    n1 = resample_to_store(source_ds, target_gm, store, interp_methods=0)
    assert n1 == 4
    # second invocation: everything present, nothing recomputed
    n2 = resample_to_store(source_ds, target_gm, store, interp_methods=0)
    assert n2 == 0

    # delete one tile -> only that tile is recomputed
    key = [k for k in store if k.startswith("band_1/") and ".z" not in k][0]
    del store[key]
    n3 = resample_to_store(source_ds, target_gm, store, interp_methods=0)
    assert n3 == 1


def test_stream_lazy_source_out_of_core():
    """A chunk-lazy source + per-tile windowing: a corner-sized target must
    touch only a fraction of the source chunks, with results identical to
    the eager engine."""
    rng = np.random.default_rng(3)
    h = w = 256
    data = rng.random((h, w)).astype(np.float32)
    source_gm = GridMapping.regular(
        size=(w, h), xy_min=(500000.0, 5000000.0), xy_res=100.0,
        crs="epsg:32632",
    )
    from xcube_resampling_tpu.xrlite import DataArray, Dataset

    src_store = zarrlite.MemoryStore()
    eager_ds = Dataset(
        dict(band=DataArray(data, dims=("y", "x"), chunks=(32, 32))),
        coords=dict(
            x=np.asarray(source_gm.x_coords.data),
            y=np.asarray(source_gm.y_coords.data),
            spatial_ref=DataArray(
                np.array(0), dims=(), attrs=source_gm.crs.to_cf()
            ),
        ),
    )
    eager_ds.data_vars["band"].attrs["grid_mapping"] = "spatial_ref"
    zarrlite.write_dataset(eager_ds, src_store)

    class CountingStore(zarrlite.MemoryStore):
        def __init__(self, base):
            super().__init__(base)
            self.read_keys = []

        def get(self, key, default=None):
            if key in self:
                self.read_keys.append(key)
            return super().get(key, default)

    counting = CountingStore(src_store)
    lazy_ds = zarrlite.open_dataset(counting, lazy=True)
    counting.read_keys.clear()

    # small target over the source's lower-left corner, same CRS
    target_gm = GridMapping.regular(
        size=(32, 32), xy_min=(500100.0, 5000100.0), xy_res=100.0,
        crs="epsg:32632", tile_size=16,
    )
    out_store = zarrlite.MemoryStore()
    n = resample_to_store(lazy_ds, target_gm, out_store, interp_methods=1)
    assert n == 4

    chunk_reads = {
        k for k in counting.read_keys
        if k.startswith("band/") and ".z" not in k
    }
    assert len(chunk_reads) < 16, (
        f"out-of-core read touched {len(chunk_reads)}/64 source chunks"
    )

    ref = resample_in_space(
        eager_ds, target_gm=target_gm.derive(tile_size=(32, 32)),
        interp_methods=1,
    )
    back = zarrlite.open_dataset(out_store)
    np.testing.assert_allclose(back.band.values, ref.band.values, atol=1e-6)
