"""Grid mappings from coordinate variables + CF coordinate generation.

Behavioural port of reference gridmapping/coords.py:49-472 onto numpy:
regularity detection via diffs against a tolerance, antimeridian (lon-360)
normalization, area-based resolution estimation for irregular 2D swaths
(0.7*min + 0.3*max heuristic, coords.py:226-264), j-axis-up detection, and
CF-compliant coordinate/bounds variable generation.
"""

from __future__ import annotations

import abc
import math

import numpy as np

from ..constants import FloatInt
from ..crs import CRS
from ..xrlite import DataArray
from .assertions import assert_instance, assert_true
from .base import DEFAULT_TOLERANCE, GridMapping
from .helpers import (
    _assert_valid_xy_names,
    _default_xy_var_names,
    _normalize_crs,
    _normalize_int_pair,
    _normalize_number_pair,
    _to_int_or_float,
    from_lon_360,
    round_to_fraction,
    to_lon_360,
)

#: Mean Earth radius [m] used to convert degrees to meters in the
#: resolution estimation heuristic (reference coords.py:46)
_ER = 6371000


class CoordsGridMapping(GridMapping, abc.ABC):
    """Grid mapping constructed from 1D/2D coordinate variables and a CRS."""

    @property
    def x_coords(self):
        assert isinstance(self._x_coords, DataArray)
        return self._x_coords

    @property
    def y_coords(self):
        assert isinstance(self._y_coords, DataArray)
        return self._y_coords

    def _new_x_coords(self) -> DataArray:
        # Should never come here
        return self._x_coords

    def _new_y_coords(self) -> DataArray:
        # Should never come here
        return self._y_coords


class Coords1DGridMapping(CoordsGridMapping):
    """Grid mapping constructed from 1D coordinate variables and a CRS."""

    def _new_xy_coords(self) -> DataArray:
        x = np.asarray(self._x_coords.data)
        y = np.asarray(self._y_coords.data)
        y2, x2 = np.broadcast_arrays(y[:, np.newaxis], x[np.newaxis, :])
        xy = DataArray(
            np.stack([x2, y2]),
            dims=("coord", self._y_coords.dims[0], self._x_coords.dims[0]),
            name="xy_coords",
        )
        return xy.chunk(
            {dim: size for (dim, size) in zip(xy.dims, self.xy_coords_chunks)}
        )


class Coords2DGridMapping(CoordsGridMapping):
    """Grid mapping constructed from 2D coordinate variables and a CRS."""

    def _new_xy_coords(self) -> DataArray:
        xy = DataArray(
            np.stack(
                [np.asarray(self._x_coords.data), np.asarray(self._y_coords.data)]
            ),
            dims=("coord",) + tuple(self._x_coords.dims),
            name="xy_coords",
        )
        return xy.chunk(
            {dim: size for (dim, size) in zip(xy.dims, self.xy_coords_chunks)}
        )


def new_grid_mapping_from_coords(
    x_coords: DataArray,
    y_coords: DataArray,
    crs: str | CRS,
    *,
    xy_res: FloatInt | tuple[FloatInt, FloatInt] = None,
    xy_bbox: tuple[FloatInt, FloatInt, FloatInt, FloatInt] = None,
    tile_size: int | tuple[int, int] = None,
    tolerance: float = DEFAULT_TOLERANCE,
) -> GridMapping:
    crs = _normalize_crs(crs)
    assert_instance(x_coords, DataArray, name="x_coords")
    assert_instance(y_coords, DataArray, name="y_coords")
    assert_true(
        x_coords.ndim in (1, 2), "x_coords and y_coords must be either 1D or 2D arrays"
    )
    assert_instance(tolerance, float, name="tolerance")
    assert_true(tolerance > 0.0, "tolerance must be greater zero")

    if x_coords.name and y_coords.name:
        xy_var_names = str(x_coords.name), str(y_coords.name)
    else:
        xy_var_names = _default_xy_var_names(crs)

    tile_size = _normalize_int_pair(tile_size, default=None)
    is_lon_360 = None  # None means "not yet known"
    if crs.is_geographic:
        is_lon_360 = bool(np.any(np.asarray(x_coords.data) > 180))

    is_regular = None

    if x_coords.ndim == 1:
        # 1D x,y coordinates
        cls = Coords1DGridMapping

        assert_true(
            x_coords.size >= 2 and y_coords.size >= 2,
            "sizes of x_coords and y_coords 1D arrays must be >= 2",
        )

        size = x_coords.size, y_coords.size

        x_dim, y_dim = x_coords.dims[0], y_coords.dims[0]

        x_diff = _abs_no_zero(np.diff(np.asarray(x_coords.data)))
        y_diff = _abs_no_zero(np.diff(np.asarray(y_coords.data)))

        if not is_lon_360 and crs.is_geographic:
            is_anti_meridian_crossed = np.any(np.nanmax(x_diff) > 180)
            if is_anti_meridian_crossed:
                x_coords = DataArray(
                    to_lon_360(x_coords), dims=x_coords.dims, name=x_coords.name
                )
                x_diff = _abs_no_zero(np.diff(np.asarray(x_coords.data)))
                is_lon_360 = True

        if xy_res is not None:
            x_res, y_res = _normalize_number_pair(xy_res)
            is_regular = True
        else:
            x_res = x_diff[0]
            y_res = y_diff[0]
            is_regular = bool(
                np.allclose(x_diff, x_res, atol=tolerance)
                and np.allclose(y_diff, y_res, atol=tolerance)
            )
            if is_regular:
                x_res = round_to_fraction(float(x_res), 5, 0.25)
                y_res = round_to_fraction(float(y_res), 5, 0.25)
            else:
                x_res = round_to_fraction(float(np.nanmedian(x_diff, axis=0)), 2, 0.5)
                y_res = round_to_fraction(float(np.nanmedian(y_diff, axis=0)), 2, 0.5)

        if (
            tile_size is None
            and x_coords.chunks is not None
            and y_coords.chunks is not None
        ):
            tile_size = (max(0, *x_coords.chunks[0]), max(0, *y_coords.chunks[0]))

        # Guess j axis direction
        is_j_axis_up = bool(
            np.asarray(y_coords.data)[0] < np.asarray(y_coords.data)[-1]
        )

    else:
        # 2D x,y coordinates
        cls = Coords2DGridMapping

        assert_true(
            x_coords.shape == y_coords.shape,
            "shapes of x_coords and y_coords 2D arrays must be equal",
        )
        assert_true(
            x_coords.dims == y_coords.dims,
            "dimensions of x_coords and y_coords 2D arrays must be equal",
        )

        y_dim, x_dim = x_coords.dims

        height, width = x_coords.shape
        size = width, height

        x = np.asarray(x_coords.data)
        y = np.asarray(y_coords.data)

        # first-chunk extents (full array when unchunked)
        if x_coords.chunks is not None:
            ch, cw = x_coords.chunks[0][0], x_coords.chunks[1][0]
        else:
            ch, cw = height, width

        x_x_diff = _abs_no_nan(np.diff(x[0, :cw]))
        x_y_diff = _abs_no_nan(np.diff(x[:ch, 0]))
        y_x_diff = _abs_no_nan(np.diff(y[0, :ch]))
        y_y_diff = _abs_no_nan(np.diff(y[:cw, 0]))

        if not is_lon_360 and crs.is_geographic:
            is_anti_meridian_crossed = np.any(np.max(x_x_diff) > 180) or np.any(
                np.max(x_y_diff) > 180
            )
            if is_anti_meridian_crossed:
                x_coords = DataArray(
                    to_lon_360(x_coords), dims=x_coords.dims, name=x_coords.name
                )
                x = np.asarray(x_coords.data)
                x_x_diff = _abs_no_nan(np.diff(x[0, :]))
                x_y_diff = _abs_no_nan(np.diff(x[:, 0]))
                is_lon_360 = True

        if xy_res is not None:
            x_res, y_res = _normalize_number_pair(xy_res)
        else:
            x_res = x_x_diff[0]
            y_res = y_y_diff[0]

        is_regular = bool(
            np.allclose(x_x_diff, x_res, atol=tolerance)
            and np.allclose(y_y_diff, y_res, atol=tolerance)
            and np.allclose(x_y_diff, 0, atol=tolerance)
            and np.allclose(y_x_diff, 0, atol=tolerance)
        )

        if not is_regular and xy_res is None:
            # The area-based estimate is rounded to 1 significant digit, so
            # float32 is ample here; above ~0.25 Mpix the scan also samples
            # a strided grid of ADJACENT pixel pairs (local diffs are
            # preserved exactly; only the min/max search is subsampled,
            # far inside the rounding granularity of the estimate).
            stride = max(1, round(math.sqrt(height * width / 262144.0)))
            x32 = x.astype(np.float32)
            y32 = y.astype(np.float32)
            if stride > 1:
                ii = np.arange(0, height - 1, stride)
                jj = np.arange(0, width - 1, stride)
                x00 = x32[np.ix_(ii, jj)]
                y00 = y32[np.ix_(ii, jj)]
                x_x_diff_c = _abs_no_nan(x32[np.ix_(ii, jj + 1)] - x00)
                x_y_diff_c = _abs_no_nan(x32[np.ix_(ii + 1, jj)] - x00)
                y_x_diff_c = _abs_no_nan(y32[np.ix_(ii, jj + 1)] - y00)
                y_y_diff_c = _abs_no_nan(y32[np.ix_(ii + 1, jj)] - y00)
            else:
                x_x_diff = _abs_no_nan(np.diff(x32, axis=1))
                x_y_diff = _abs_no_nan(np.diff(x32, axis=0))
                y_x_diff = _abs_no_nan(np.diff(y32, axis=1))
                y_y_diff = _abs_no_nan(np.diff(y32, axis=0))

                # Give diff arrays the original shape by doubling last
                # rows/cols
                x_x_diff_c = np.concatenate([x_x_diff, x_x_diff[:, -1:]], axis=1)
                y_x_diff_c = np.concatenate([y_x_diff, y_x_diff[:, -1:]], axis=1)
                x_y_diff_c = np.concatenate([x_y_diff, x_y_diff[-1:, :]], axis=0)
                y_y_diff_c = np.concatenate([y_y_diff, y_y_diff[-1:, :]], axis=0)
            # Find resolution via pixel area
            x_abs_diff = np.sqrt(np.square(x_x_diff_c) + np.square(x_y_diff_c))
            y_abs_diff = np.sqrt(np.square(y_x_diff_c) + np.square(y_y_diff_c))
            if crs.is_geographic:
                # Convert degrees into meters
                x_abs_diff_r = np.radians(x_abs_diff)
                y_abs_diff_r = np.radians(y_abs_diff)
                x_abs_diff = _ER * np.cos(x_abs_diff_r) * y_abs_diff_r
                y_abs_diff = _ER * y_abs_diff_r
            xy_areas = (x_abs_diff * y_abs_diff).flatten()
            xy_areas = np.where(xy_areas > 0, xy_areas, np.nan)
            xy_area_index_min = np.nanargmin(xy_areas)
            xy_area_index_max = np.nanargmax(xy_areas)
            # Convert area to edge length
            xy_res_min = math.sqrt(xy_areas[xy_area_index_min])
            xy_res_max = math.sqrt(xy_areas[xy_area_index_max])
            # Empirically weight min more than max
            xy_res_est = 0.7 * xy_res_min + 0.3 * xy_res_max
            if crs.is_geographic:
                # Convert meters back into degrees
                xy_res_est = math.degrees(xy_res_est / _ER)
            # Because this is an estimation, round to a nice number
            xy_res_est = round_to_fraction(xy_res_est, digits=1, resolution=0.5)
            x_res, y_res = float(xy_res_est), float(xy_res_est)

        if tile_size is None and x_coords.chunks is not None:
            j_chunks, i_chunks = x_coords.chunks
            tile_size = max(0, *i_chunks), max(0, *j_chunks)

        if tile_size is not None:
            tile_width, tile_height = tile_size
            x_coords = x_coords.chunk(
                {
                    x_coords.dims[0]: tile_height,
                    x_coords.dims[1]: tile_width,
                }
            )
            y_coords = y_coords.chunk(
                {
                    y_coords.dims[0]: tile_height,
                    y_coords.dims[1]: tile_width,
                }
            )

        # Guess j axis direction
        cw2 = y_coords.chunks[1][0] if y_coords.chunks is not None else width
        is_j_axis_up = bool(
            np.all(
                np.asarray(y_coords.data)[0, :cw2]
                < np.asarray(y_coords.data)[-1, :cw2]
            )
        )

    assert_true(
        x_res > 0 and y_res > 0,
        "internal error: x_res and y_res could not be determined",
        exception_type=RuntimeError,
    )

    x_res, y_res = _to_int_or_float(x_res), _to_int_or_float(y_res)
    if xy_bbox is None:
        x_res_05, y_res_05 = x_res / 2, y_res / 2
        x_data = np.asarray(x_coords.data)
        y_data = np.asarray(y_coords.data)
        x_min = _to_int_or_float(float(x_data[..., 0].min()) - x_res_05)
        x_max = _to_int_or_float(float(x_data[..., -1].max()) + x_res_05)
        if is_j_axis_up:
            y_min = _to_int_or_float(float(y_data[0, ...].min()) - y_res_05)
            y_max = _to_int_or_float(float(y_data[-1, ...].max()) + y_res_05)
        else:
            y_min = _to_int_or_float(float(y_data[-1, ...].min()) - y_res_05)
            y_max = _to_int_or_float(float(y_data[0, ...].max()) + y_res_05)
        xy_bbox = (x_min, y_min, x_max, y_max)

    if cls is Coords1DGridMapping and is_regular:
        from .regular import RegularGridMapping

        cls = RegularGridMapping

    return cls(
        x_coords=x_coords,
        y_coords=y_coords,
        crs=crs,
        size=size,
        tile_size=tile_size,
        xy_bbox=xy_bbox,
        xy_res=(x_res, y_res),
        xy_var_names=xy_var_names,
        xy_dim_names=(str(x_dim), str(y_dim)),
        is_regular=is_regular,
        is_lon_360=is_lon_360,
        is_j_axis_up=is_j_axis_up,
    )


_ZERO_ATOL = 1.0e-8  # |x| <= atol is np.isclose(x, 0)'s default criterion


def _abs_no_zero(array) -> np.ndarray:
    array = np.fabs(np.asarray(array))
    return np.where(array <= _ZERO_ATOL, np.nan, array)


def _abs_no_nan(array) -> np.ndarray:
    array = np.fabs(np.asarray(array))
    return np.where(np.logical_or(np.isnan(array), array <= _ZERO_ATOL), 0, array)


def grid_mapping_to_coords(
    grid_mapping: GridMapping,
    xy_var_names: tuple[str, str] = None,
    xy_dim_names: tuple[str, str] = None,
    reuse_coords: bool = False,
    exclude_bounds: bool = False,
) -> dict[str, DataArray]:
    """Get CF-compliant axis coordinate variables and cell boundary
    coordinate variables for a regular grid mapping
    (reference coords.py:340-472)."""

    if xy_var_names:
        _assert_valid_xy_names(xy_var_names, name="xy_var_names")
    if xy_dim_names:
        _assert_valid_xy_names(xy_dim_names, name="xy_dim_names")

    if reuse_coords:
        try:
            x, y = grid_mapping.x_coords, grid_mapping.y_coords
        except AttributeError:
            x, y = None, None
        if (
            isinstance(x, DataArray)
            and isinstance(y, DataArray)
            and x.ndim == 1
            and y.ndim == 1
            and x.size == grid_mapping.width
            and y.size == grid_mapping.height
        ):
            return {
                name: DataArray(coord.values, dims=dim, attrs=coord.attrs)
                for name, dim, coord in zip(xy_var_names, xy_dim_names, (x, y))
            }

    x_name, y_name = xy_var_names or grid_mapping.xy_var_names
    x_dim_name, y_dim_name = xy_dim_names or grid_mapping.xy_dim_names
    w, h = grid_mapping.size
    x1, y1, x2, y2 = grid_mapping.xy_bbox
    x_res, y_res = grid_mapping.xy_res
    x_res_05 = x_res / 2
    y_res_05 = y_res / 2

    dtype = np.float64

    x_data = np.linspace(x1 + x_res_05, x2 - x_res_05, w, dtype=dtype)
    if grid_mapping.is_lon_360:
        x_data = from_lon_360(x_data)

    if grid_mapping.is_j_axis_up:
        y_data = np.linspace(y1 + y_res_05, y2 - y_res_05, h, dtype=dtype)
    else:
        y_data = np.linspace(y2 - y_res_05, y1 + y_res_05, h, dtype=dtype)

    if grid_mapping.crs.is_geographic:
        x_attrs = dict(
            long_name="longitude coordinate",
            standard_name="longitude",
            units="degrees_east",
        )
        y_attrs = dict(
            long_name="latitude coordinate",
            standard_name="latitude",
            units="degrees_north",
        )
    else:
        x_attrs = dict(
            long_name="x coordinate of projection",
            standard_name="projection_x_coordinate",
        )
        y_attrs = dict(
            long_name="y coordinate of projection",
            standard_name="projection_y_coordinate",
        )

    x_coords = DataArray(x_data, dims=x_dim_name, attrs=x_attrs)
    y_coords = DataArray(y_data, dims=y_dim_name, attrs=y_attrs)
    coords = {
        x_name: x_coords,
        y_name: y_coords,
    }
    if not exclude_bounds:
        x_bnds_0_data = np.linspace(x1, x2 - x_res, w, dtype=dtype)
        x_bnds_1_data = np.linspace(x1 + x_res, x2, w, dtype=dtype)

        if grid_mapping.is_lon_360:
            x_bnds_0_data = from_lon_360(x_bnds_0_data)
            x_bnds_1_data = from_lon_360(x_bnds_1_data)

        if grid_mapping.is_j_axis_up:
            y_bnds_0_data = np.linspace(y1, y2 - y_res, h, dtype=dtype)
            y_bnds_1_data = np.linspace(y1 + y_res, y2, h, dtype=dtype)
        else:
            y_bnds_0_data = np.linspace(y2, y1 + y_res, h, dtype=dtype)
            y_bnds_1_data = np.linspace(y2 - y_res, y1, h, dtype=dtype)

        bnds_dim_name = "bnds"
        x_bnds_name = f"{x_name}_{bnds_dim_name}"
        y_bnds_name = f"{y_name}_{bnds_dim_name}"
        # Per CF, bounds variables need no attributes of their own.
        x_bnds_coords = DataArray(
            np.stack([x_bnds_0_data, x_bnds_1_data], axis=-1),
            dims=(x_dim_name, bnds_dim_name),
        )
        y_bnds_coords = DataArray(
            np.stack([y_bnds_0_data, y_bnds_1_data], axis=-1),
            dims=(y_dim_name, bnds_dim_name),
        )
        x_coords.attrs.update(bounds=x_bnds_name)
        y_coords.attrs.update(bounds=y_bnds_name)
        coords.update(
            {
                x_bnds_name: x_bnds_coords,
                y_bnds_name: y_bnds_coords,
            }
        )

    return coords
