"""Device-nearest tie behaviour: the measured contract (roadmap #4).

The device gather kernel evaluates fractional source indices in float32
(ops/reproject_ops.py coarse-field strategy); at exact half-integer
fractions nearest-neighbour may flip to the equally-distant source pixel
relative to the float64 host engine.  The reference documents such ties as
arbitrary (/root/reference/xcube_resampling/rectify.py:549-551 "one is as
good as the other").  This test pins the contract:

* flips occur ONLY at genuine half-integer ties (crafted here by aligning
  a Web-Mercator target exactly halfway between geographic source columns
  — Mercator x is linear in longitude, so the tie is exact by
  construction);
* away from ties (quarter-pixel control offset) the device result equals
  the host result pixel-for-pixel.

A regression from "rare boundary tie" to "systematic off-by-one" fails the
control assertion.
"""

import numpy as np
import jax.numpy as jnp

from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.reproject_ops import make_fused_reproject_fn

R = 6378137.0  # EPSG:3857 sphere radius
D2R = np.pi / 180.0


def _run(x_shift_src_px: float):
    # realistic resolution: the approximate-field error bound assumes
    # sub-degree pixels (curvature over a 16-px coarse cell)
    src_res = 0.02
    src_w, src_h = 400, 300
    lon0, lat0 = -4.0, 40.0
    source_gm = GridMapping.regular(
        size=(src_w, src_h),
        xy_min=(lon0, lat0),
        xy_res=src_res,
        crs="epsg:4326",
    )
    # target grid: one source pixel per target pixel in x, origin shifted
    # by a controlled fraction of a source pixel (Mercator x is linear in
    # longitude, so the tie crafting is exact)
    xres = R * D2R * src_res
    x0 = R * D2R * (lon0 + 2.0 + x_shift_src_px * src_res)
    y0 = R * np.log(np.tan(np.pi / 4 + np.radians(43.0) / 2))
    target_gm = GridMapping.regular(
        size=(48, 32),
        xy_min=(x0, y0),
        xy_res=xres,
        crs="epsg:3857",
    )
    rng = np.random.default_rng(7)
    data = rng.random((src_h, src_w), dtype=np.float32)

    fn = make_fused_reproject_fn(source_gm, target_gm, "nearest", np.nan)
    dev = np.asarray(fn(jnp.asarray(data)))

    # float64 host truth: exact inverse transform + round-half-away nearest
    from xcube_resampling_tpu.crs import Transformer

    t = Transformer.from_crs(target_gm.crs, source_gm.crs, always_xy=True)
    tx = np.asarray(target_gm.x_coords.data, dtype=np.float64)
    ty = np.asarray(target_gm.y_coords.data, dtype=np.float64)
    xx, yy = np.meshgrid(tx, ty)
    lon, lat = t.transform(xx, yy)
    # regular grids are j-axis-down: row 0 holds the maximum latitude
    ix = (lon - (-4.0)) / src_res - 0.5
    iy = ((40.0 + 300 * src_res) - lat) / src_res - 0.5
    return dev, data, ix, iy


#: documented positional error bound of the approximate coordinate field
#: (ops/reproject_ops.py module docstring: "sub-1e-2 px")
FIELD_ERR = 2e-2


def test_device_nearest_flips_only_at_ties():
    # half-pixel shift: every target column sits exactly between two
    # source columns — the tie surface
    dev, data, ix, iy = _run(0.5)
    # GridMapping.regular snaps the grid origin to a resolution fraction,
    # shifting the crafted tie by ~1e-4 px — still far inside the
    # field-error band around the rounding boundary
    fx = np.abs(ix - np.round(ix))
    assert np.isclose(fx, 0.5, atol=5e-4).all()  # the crafting worked

    # wherever the device disagrees with exact-f64 nearest, the true
    # fraction must be within the documented field-error bound of the
    # rounding boundary, and the chosen value must still come from the
    # 2x2 neighbourhood of the true position
    jx = np.clip(np.round(ix).astype(int), 0, 399)
    jy = np.clip(np.round(iy).astype(int), 0, 299)
    expected = data[jy, jx]
    flipped = ~np.isclose(dev, expected)

    fy = np.abs(iy - np.round(iy))
    near_boundary = (np.abs(fx - 0.5) < FIELD_ERR) | (
        np.abs(fy - 0.5) < FIELD_ERR
    )
    assert (near_boundary | ~flipped).all()

    x0 = np.clip(np.floor(ix).astype(int), 0, 399)
    y0 = np.clip(np.floor(iy).astype(int), 0, 299)
    x1 = np.clip(x0 + 1, 0, 399)
    y1 = np.clip(y0 + 1, 0, 299)
    candidates = np.stack(
        [data[y0, x0], data[y0, x1], data[y1, x0], data[y1, x1]]
    )
    in_neighbourhood = np.isclose(candidates, dev[None]).any(axis=0)
    assert in_neighbourhood.all()


def test_device_nearest_matches_host_away_from_ties():
    # quarter-pixel control: no ties anywhere, so float32 rounding noise
    # must never flip the selected source pixel
    dev, data, ix, iy = _run(0.25)
    fx = np.abs(ix - np.round(ix))
    assert (np.abs(fx - 0.5) > 0.2).all()  # safely away from the boundary

    jx = np.clip(np.round(ix).astype(int), 0, 399)
    jy = np.clip(np.round(iy).astype(int), 0, 299)
    expected = data[jy, jx]
    mismatches = ~np.isclose(dev, expected, equal_nan=True)
    assert int(mismatches.sum()) == 0
