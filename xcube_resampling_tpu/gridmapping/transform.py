"""CRS transformation of whole grid mappings
(reference gridmapping/transform.py:57-125).

Transforms the full (2, height, width) coordinate image to a new CRS via the
native :class:`~xcube_resampling_tpu.crs.Transformer` (float64 on host — and
available fused on TPU through the reproject engine), producing an irregular
2D-coords grid mapping.
"""

from __future__ import annotations

import numpy as np

from ..constants import FloatInt
from ..crs import CRS, Transformer
from ..xrlite import DataArray
from .base import DEFAULT_TOLERANCE, GridMapping
from .coords import new_grid_mapping_from_coords
from .helpers import (
    _assert_valid_xy_names,
    _normalize_crs,
    _normalize_number_pair,
)


def transform_grid_mapping(
    grid_mapping: GridMapping,
    crs: str | CRS,
    *,
    xy_res: FloatInt | tuple[FloatInt, FloatInt] = None,
    tile_size: int | tuple[int, int] = None,
    xy_var_names: tuple[str, str] = None,
    tolerance: float = DEFAULT_TOLERANCE,
) -> GridMapping:
    target_crs = _normalize_crs(crs)

    if xy_var_names:
        _assert_valid_xy_names(xy_var_names, name="xy_var_names")

    source_crs = grid_mapping.crs
    if source_crs == target_crs:
        if tile_size is not None or xy_var_names is not None:
            return grid_mapping.derive(tile_size=tile_size, xy_var_names=xy_var_names)
        return grid_mapping

    transformer = Transformer.from_crs(source_crs, target_crs, always_xy=True)

    xy = np.asarray(grid_mapping.xy_coords.data, dtype=np.float64)
    x2, y2 = transformer.transform(xy[0], xy[1])
    xy_dims = grid_mapping.xy_coords.dims[1:]

    if xy_res is not None:
        xy_bbox = transformer.transform_bounds(*grid_mapping.xy_bbox, densify_pts=101)
        x_res, y_res = _normalize_number_pair(xy_res)
        x_res_05, y_res_05 = x_res / 2, y_res / 2
        xy_bbox = (
            xy_bbox[0] - x_res_05,
            xy_bbox[1] - y_res_05,
            xy_bbox[2] + x_res_05,
            xy_bbox[3] + y_res_05,
        )
    else:
        xy_bbox = None

    xy_var_names = xy_var_names or ("transformed_x", "transformed_y")

    if tile_size is None:
        tile_size = grid_mapping.tile_size

    return new_grid_mapping_from_coords(
        x_coords=DataArray(x2, dims=xy_dims, name=xy_var_names[0]),
        y_coords=DataArray(y2, dims=xy_dims, name=xy_var_names[1]),
        crs=target_crs,
        xy_res=xy_res,
        xy_bbox=xy_bbox,
        tile_size=tile_size,
        tolerance=tolerance,
    )
