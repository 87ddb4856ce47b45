"""Reproject a large regular grid across CRSs.

Mirrors the reference's large-example notebook workflow
(/root/reference/examples/resample_in_space_large_example_reproject_dataset
.ipynb): a continental EPSG:4326 grid reprojected to EPSG:3035, plus the
device fast path (fused kernel) and the sharded multi-device path.

Run:  python examples/reproject_large.py        (host engine)
      python examples/reproject_large.py device (fused jit kernel)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _bootstrap  # noqa: F401  (path setup + JAX_PLATFORMS handling)

import numpy as np

from xcube_resampling_tpu import DataArray, Dataset, GridMapping, resample_in_space
from xcube_resampling_tpu.crs import CRS


def build_source(w=2400, h=1200):
    """~0.05 deg Europe-ish grid with a smooth synthetic field."""
    lon = np.linspace(-10.0, 50.0, w)
    lat = np.linspace(70.0, 10.0, h)
    data = (
        np.sin(np.radians(lat))[:, None] * np.cos(3 * np.radians(lon))[None, :]
    ).astype(np.float32)
    ds = Dataset(
        dict(temperature=DataArray(data, dims=("lat", "lon"))),
        coords=dict(
            lon=lon,
            lat=lat,
            spatial_ref=DataArray(
                np.array(0), dims=(), attrs=CRS.from_epsg(4326).to_cf()
            ),
        ),
    )
    ds.data_vars["temperature"].attrs["grid_mapping"] = "spatial_ref"
    return ds


def main(mode: str):
    source_ds = build_source()
    target_gm = GridMapping.regular(
        size=(2048, 2048),
        xy_min=(2500000.0, 1400000.0),
        xy_res=2000.0,
        crs="epsg:3035",
        tile_size=1024,
    )

    if mode == "device":
        import jax.numpy as jnp

        from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn

        source_gm = GridMapping.from_dataset(source_ds)
        fn = make_fused_reproject_fn(source_gm, target_gm, "bilinear", np.nan)
        src = jnp.asarray(source_ds.temperature.values)
        t0 = time.perf_counter()
        out = np.asarray(fn(src))
        dt = time.perf_counter() - t0
        print(f"device fused reproject: {out.shape}, {dt*1e3:.1f} ms "
              f"({out.size/dt/1e6:.0f} Mpix/s, includes first transfer)")
    else:
        t0 = time.perf_counter()
        out_ds = resample_in_space(
            source_ds, target_gm=target_gm, interp_methods="bilinear"
        )
        dt = time.perf_counter() - t0
        out = out_ds.temperature.values
        print(f"host engine reproject: {out.shape}, {dt:.2f} s")

    print("coverage:", f"{np.isfinite(out).mean():.1%}",
          "mean:", float(np.nanmean(out)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "host")
