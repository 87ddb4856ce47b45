"""GridMapping tour: construction, CF inference, derivation, transforms.

Mirrors the reference's coords notebook workflow
(/root/reference/docs/examples/coords.ipynb).

Run:  python examples/gridmapping_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _bootstrap  # noqa: F401  (path setup + JAX_PLATFORMS handling)

import numpy as np

from xcube_resampling_tpu import CRS, DataArray, Dataset, GridMapping


def main():
    # 1. a regular grid from scratch
    gm = GridMapping.regular(
        size=(1440, 720), xy_min=(-180, -90), xy_res=0.25, crs="EPSG:4326",
        tile_size=360,
    )
    print(gm._repr_markdown_())
    print()

    # 2. CF inference from a dataset (UTM with a spatial_ref variable)
    ds = Dataset(
        dict(
            band=DataArray(
                np.zeros((100, 100), np.float32),
                dims=("y", "x"),
                attrs=dict(grid_mapping="spatial_ref"),
            )
        ),
        coords=dict(
            x=500000.0 + 10.0 * np.arange(100) + 5.0,
            y=5900000.0 - 10.0 * np.arange(100) - 5.0,
            spatial_ref=DataArray(
                np.array(0), dims=(), attrs=CRS.from_epsg(32632).to_cf()
            ),
        ),
    )
    gm_utm = GridMapping.from_dataset(ds)
    print("inferred:", gm_utm.size, gm_utm.crs, "regular:", gm_utm.is_regular)

    # 3. derive / scale
    print("half-res:", gm_utm.scale(0.5).size)

    # 4. transform into another CRS -> irregular 2D coordinates
    gm_geo = gm_utm.transform("EPSG:4326")
    print("transformed:", type(gm_geo).__name__, "regular:", gm_geo.is_regular,
          "estimated res:", gm_geo.xy_res)

    # 5. regularize the irregular mapping
    gm_reg = gm_geo.to_regular()
    print("regularized:", gm_reg.size, gm_reg.xy_res)

    # 6. CF-compliant coordinate variables with bounds
    coords = gm_reg.to_coords()
    print("coord vars:", sorted(coords))


if __name__ == "__main__":
    main()
