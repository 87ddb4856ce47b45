"""Out-of-core streaming execution: resample tile-by-tile into a store.

The reference relies on dask laziness for out-of-core work and on the
caller writing zarr (SURVEY.md §2.3/§5).  Here the loop is explicit and
*resumable*: each target tile is computed independently (one static-shape
kernel invocation) and written as one zarr chunk; tiles already present in
the store are skipped, so an interrupted job restarted with the same
arguments finishes the remaining tiles only.  Device memory holds a single
tile's working set at a time.
"""

from __future__ import annotations

import numpy as np

from .. import zarrlite
from ..gridmapping import GridMapping
from ..spatial import resample_in_space
from ..xrlite import Dataset


def resample_to_store(
    source_ds: Dataset,
    target_gm: GridMapping,
    store,
    variables=None,
    interp_methods=None,
    agg_methods=None,
    recover_nans=False,
    fill_values=None,
    compressor: str | None = None,
    progress=None,
) -> int:
    """Resample *source_ds* to *target_gm* tile by tile into a zarr store.

    Returns the number of tiles computed in this call (0 when the store was
    already complete — the resume case)."""
    g = zarrlite.group(store)

    tile_w, tile_h = target_gm.tile_width, target_gm.tile_height
    out_w, out_h = target_gm.width, target_gm.height
    x_dim, y_dim = target_gm.xy_dim_names

    # target coordinate/metadata setup (idempotent)
    coords = target_gm.to_coords(exclude_bounds=True)
    for name, coord in coords.items():
        if name not in g:
            arr = g.create_array(
                name,
                coord.shape,
                coord.dtype,
                fill_value=None,
                compressor=compressor,
                attrs=coord.attrs,
                dims=coord.dims,
            )
            arr.write(np.asarray(coord.data))
    if "spatial_ref" not in g:
        sr = g.create_array("spatial_ref", (), np.uint8, fill_value=0)
        attrs = target_gm.crs.to_cf()
        attrs["_ARRAY_DIMENSIONS"] = []
        sr.attrs.update(**attrs)

    # data variable setup
    if variables is None:
        var_names = [
            n
            for n, v in source_ds.data_vars.items()
            if v.dims[-2:]
            == (source_ds[n].dims[-2], source_ds[n].dims[-1])
            and v.ndim in (2, 3)
        ]
    elif isinstance(variables, str):
        var_names = [variables]
    else:
        var_names = list(variables)

    arrays = {}
    for name in var_names:
        var = source_ds.data_vars[name]
        shape = var.shape[:-2] + (out_h, out_w)
        chunks = tuple(var.shape[:-2]) + (tile_h, tile_w)
        if name not in g:
            attrs = dict(var.attrs)
            attrs["grid_mapping"] = "spatial_ref"
            dims = var.dims[:-2] + (y_dim, x_dim)
            g.create_array(
                name,
                shape,
                var.dtype,
                chunks=chunks,
                fill_value=None,
                compressor=compressor,
                attrs=attrs,
                dims=dims,
            )
        arrays[name] = g[name]

    n_tiles_x = -(-out_w // tile_w)
    n_tiles_y = -(-out_h // tile_h)
    computed = 0
    for tj in range(n_tiles_y):
        for ti in range(n_tiles_x):
            lead_index = tuple(
                0 for _ in range(arrays[var_names[0]].ndim - 2)
            )
            if all(
                arrays[n].has_tile(lead_index + (tj, ti)) for n in var_names
            ):
                continue  # resume: tile already done
            w = min(tile_w, out_w - ti * tile_w)
            h = min(tile_h, out_h - tj * tile_h)
            tile_gm = GridMapping.regular(
                size=(max(w, 2), max(h, 2)),
                xy_min=(
                    target_gm.x_min + ti * tile_w * target_gm.x_res,
                    (
                        target_gm.y_min + tj * tile_h * target_gm.y_res
                        if target_gm.is_j_axis_up
                        else target_gm.y_max - (tj * tile_h + h) * target_gm.y_res
                    ),
                ),
                xy_res=target_gm.xy_res,
                crs=target_gm.crs,
                is_j_axis_up=bool(target_gm.is_j_axis_up),
            )
            tile_ds = resample_in_space(
                source_ds,
                target_gm=tile_gm,
                variables=var_names,
                interp_methods=interp_methods,
                agg_methods=agg_methods,
                recover_nans=recover_nans,
                fill_values=fill_values,
            )
            for name in var_names:
                data = np.asarray(tile_ds.data_vars[name].data)[..., :h, :w]
                arrays[name].write_tile(data, lead_index + (tj, ti))
            computed += 1
            if progress is not None:
                progress(tj * n_tiles_x + ti + 1, n_tiles_y * n_tiles_x)

    zarrlite.consolidate_metadata(g.store)
    return computed
