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
