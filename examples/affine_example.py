"""Affine resampling tour: subset, shift, up- and down-scaling.

Mirrors the reference's affine notebook workflow
(/root/reference/docs/examples/affine.ipynb) on synthetic data.

Run:  python examples/affine_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _bootstrap  # noqa: F401  (path setup + JAX_PLATFORMS handling)

import numpy as np

from xcube_resampling_tpu import (
    DataArray,
    Dataset,
    GridMapping,
    affine_transform_dataset,
)
from xcube_resampling_tpu.crs import CRS_WGS84


def build_source():
    res = 0.1
    h, w = 60, 80
    data = (np.indices((h, w)).sum(axis=0) % 7).astype(np.float64)
    data[10:12, 20:25] = np.nan
    return Dataset(
        dict(refl=DataArray(data, dims=("lat", "lon"))),
        coords=dict(
            lon=50.0 + res * np.arange(w) + res / 2,
            lat=16.0 - res * np.arange(h) - res / 2,
        ),
    )


def main():
    source_ds = build_source()
    source_gm = GridMapping.from_dataset(source_ds)
    print("source:", source_gm.size, source_gm.xy_bbox)

    # subset at native resolution
    target_gm = GridMapping.regular((40, 30), (51.0, 12.0), 0.1, CRS_WGS84)
    out = affine_transform_dataset(source_ds, target_gm, interp_methods=1)
    print("subset:", out.refl.shape, "nanmean", np.nanmean(out.refl.values))

    # 2x upscale with NaN recovery
    target_gm = GridMapping.regular((80, 60), (51.0, 12.0), 0.05, CRS_WGS84)
    out = affine_transform_dataset(
        source_ds, target_gm, interp_methods="bilinear", recover_nans=True
    )
    print("2x upscale:", out.refl.shape, "NaNs:", int(np.isnan(out.refl.values).sum()))

    # 2x downscale with mean aggregation
    target_gm = GridMapping.regular((40, 30), (50.0, 10.0), 0.2, CRS_WGS84)
    out = affine_transform_dataset(
        source_ds, target_gm, interp_methods=1, agg_methods="mean"
    )
    print("2x downscale:", out.refl.shape, "nanmean", np.nanmean(out.refl.values))


if __name__ == "__main__":
    main()
