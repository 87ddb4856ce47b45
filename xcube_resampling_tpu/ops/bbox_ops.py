"""Device variants of the bbox-discovery kernels.

Host-side bbox scans (gridmapping/bboxes.py) feed tiling decisions and are
usually cheap; these XLA variants exist for pipelines that keep the
coordinate images resident on device (e.g. swath coordinates already
uploaded for rectification) — the scan is a masked min/max reduction, which
XLA executes as a handful of fused reductions instead of a coordinate
download + host pass.
"""

from __future__ import annotations

import numpy as np


def compute_ij_bboxes_jax(
    x_image,
    y_image,
    xy_bboxes,
    xy_border: float = 0.0,
    ij_border: int = 0,
):
    """Masked min/max reduction per xy bbox; returns (n, 4) int32 with -1
    rows where nothing intersects (semantics of
    gridmapping.bboxes.compute_ij_bboxes)."""
    import jax
    import jax.numpy as jnp

    h, w = x_image.shape
    jj = jnp.arange(h, dtype=jnp.int32)[:, None]
    ii = jnp.arange(w, dtype=jnp.int32)[None, :]

    def one(bbox):
        x_min = bbox[0] - xy_border
        y_min = bbox[1] - xy_border
        x_max = bbox[2] + xy_border
        y_max = bbox[3] + xy_border
        mask = (
            (x_image >= x_min)
            & (x_image <= x_max)
            & (y_image >= y_min)
            & (y_image <= y_max)
        )
        big = jnp.int32(2**30)
        i0 = jnp.min(jnp.where(mask, ii, big))
        j0 = jnp.min(jnp.where(mask, jj, big))
        i1 = jnp.max(jnp.where(mask, ii, -1)) + 1
        j1 = jnp.max(jnp.where(mask, jj, -1)) + 1
        found = mask.any()
        if ij_border:
            i0 = jnp.maximum(i0 - ij_border, 0)
            j0 = jnp.maximum(j0 - ij_border, 0)
            i1 = jnp.minimum(i1 + ij_border, w)
            j1 = jnp.minimum(j1 + ij_border, h)
        box = jnp.stack([i0, j0, i1, j1]).astype(jnp.int32)
        return jnp.where(found, box, jnp.full((4,), -1, jnp.int32))

    return jax.vmap(one)(jnp.asarray(xy_bboxes, dtype=x_image.dtype))


def compute_xy_bbox_jax(xy_coords):
    """NaN-aware coordinate-image bounding box on device."""
    import jax.numpy as jnp

    x = xy_coords[0]
    y = xy_coords[1]
    return (
        jnp.nanmin(x),
        jnp.nanmin(y),
        jnp.nanmax(x),
        jnp.nanmax(y),
    )
