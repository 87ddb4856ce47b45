"""Out-of-core resampling: chunk-lazy zarr input, resumable tiled output.

Builds a synthetic UTM raster on disk, reopens it lazily (no pixel data
in memory), and reprojects it tile-by-tile into a second store.  Interrupt
and re-run: only missing tiles are recomputed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _bootstrap  # noqa: F401  (path setup + JAX_PLATFORMS handling)

import numpy as np

from xcube_resampling_tpu import GridMapping, zarrlite
from xcube_resampling_tpu.parallel.stream import resample_to_store
from xcube_resampling_tpu.xrlite import DataArray, Dataset

# --- write a chunked source store ------------------------------------
h = w = 1024
source_gm = GridMapping.regular(
    size=(w, h), xy_min=(500000.0, 5000000.0), xy_res=100.0,
    crs="epsg:32632",
)
yy, xx = np.mgrid[0:h, 0:w]
band = (np.sin(xx / 50.0) * np.cos(yy / 40.0)).astype(np.float32)

src_store = zarrlite.MemoryStore()  # use a directory path on disk instead
ds = Dataset(
    dict(band=DataArray(band, dims=("y", "x"), chunks=(256, 256))),
    coords=dict(
        x=np.asarray(source_gm.x_coords.data),
        y=np.asarray(source_gm.y_coords.data),
        spatial_ref=DataArray(np.array(0), dims=(), attrs=source_gm.crs.to_cf()),
    ),
)
ds.data_vars["band"].attrs["grid_mapping"] = "spatial_ref"
zarrlite.write_dataset(ds, src_store)

# --- reopen lazily: pixel payload stays in the store ------------------
lazy = zarrlite.open_dataset(src_store, lazy=True)
print("band data:", lazy.band.data)  # LazyArray(shape=..., chunks=...)

# --- stream-resample into a tiled output store ------------------------
target_gm = GridMapping.regular(
    size=(512, 512), xy_min=(4270000.0, 2480000.0), xy_res=150.0,
    crs="epsg:3035", tile_size=128,
)
out_store = zarrlite.MemoryStore()
n = resample_to_store(lazy, target_gm, out_store, interp_methods="bilinear")
print(f"computed {n} tiles")

# resume is free: everything is already present
n2 = resample_to_store(lazy, target_gm, out_store, interp_methods="bilinear")
print(f"second run recomputed {n2} tiles")

out = zarrlite.open_dataset(out_store)
print("output:", out.band.shape, "valid:", np.isfinite(out.band.values).mean())
