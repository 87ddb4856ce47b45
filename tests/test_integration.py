"""End-to-end integration: swath -> rectify -> reproject -> persist ->
reopen -> verify.  (The reference ships only an empty integration
placeholder; this exercises the full pipeline.)"""

import numpy as np

from xcube_resampling_tpu import zarrlite
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.spatial import resample_in_space

from .sampledata import create_olci_like_swath


def test_swath_to_projected_store(tmp_path):
    # small synthetic swath (irregular 2D lon/lat)
    ds = create_olci_like_swath(width=120, height=160, tile_size=64)

    # 1. rectify to a derived regular geographic grid (dispatch: rectify)
    rectified = resample_in_space(ds, interp_methods="bilinear")
    assert "lon" in rectified.coords and "lat" in rectified.coords
    assert np.isfinite(rectified.rad.values).mean() > 0.4

    # 2. reproject the rectified grid to LAEA Europe (dispatch: reproject)
    rect_gm = GridMapping.from_dataset(rectified)
    x0, y0, x1, y1 = rect_gm.xy_bbox
    from xcube_resampling_tpu.crs import Transformer

    cx, cy = Transformer.from_crs(rect_gm.crs, "epsg:3035").transform(
        (x0 + x1) / 2, (y0 + y1) / 2
    )
    target_gm = GridMapping.regular(
        size=(96, 96),
        xy_min=(cx - 48 * 200.0, cy - 48 * 200.0),
        xy_res=200.0,
        crs="epsg:3035",
        tile_size=48,
    )
    projected = resample_in_space(
        rectified, target_gm=target_gm, interp_methods="bilinear"
    )
    assert np.isfinite(projected.band_values if False else projected.rad.values).any()

    # 3. persist to zarr and read back
    store_path = tmp_path / "out.zarr"
    zarrlite.write_dataset(projected, str(store_path), compressor="zlib")
    back = zarrlite.open_dataset(str(store_path))
    np.testing.assert_array_equal(back.rad.values, projected.rad.values)

    # 4. the reopened store carries enough CF metadata to re-infer geometry
    gm_back = GridMapping.from_dataset(back)
    assert gm_back.crs == target_gm.crs
    assert gm_back.size == target_gm.size
