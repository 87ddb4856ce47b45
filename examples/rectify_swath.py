"""Rectify an irregular satellite swath to a regular grid.

Mirrors the reference's rectify_sentinel3 notebook workflow
(/root/reference/examples/rectify_sentinel3.ipynb) using the synthetic
OLCI-like swath generator (the real zarr sample is not shipped).

Run:  python examples/rectify_swath.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _bootstrap  # noqa: F401  (path setup + JAX_PLATFORMS handling)

import numpy as np

from tests.sampledata import create_olci_like_swath
from xcube_resampling_tpu import GridMapping, rectify_dataset
from xcube_resampling_tpu.profiling import PhaseTimer


def main():
    timer = PhaseTimer()

    with timer("open swath"):
        ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)
    print("source:", ds.rad.shape, "irregular 2D lon/lat coordinates")

    with timer("infer grid mapping"):
        gm = GridMapping.from_dataset(ds)
    print("swath grid mapping:", gm.size, gm.crs, "regular:", gm.is_regular)

    # nearest-neighbour rectification onto the derived regular grid
    with timer("rectify nearest"):
        out = rectify_dataset(ds, interp_methods=0)
    print("rectified:", out.rad.shape, "coverage:",
          f"{np.isfinite(out.rad.values).mean():.1%}")

    # bilinear, explicit target grid with tiling
    target_gm = GridMapping.from_dataset(ds).to_regular(tile_size=512)
    with timer("rectify bilinear"):
        out2 = rectify_dataset(ds, target_gm=target_gm, interp_methods="bilinear")
    print("bilinear rectified:", out2.rad.shape, "chunks:", out2.rad.chunks)

    print()
    print(timer.report())


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total: {time.perf_counter() - t0:.2f}s")
