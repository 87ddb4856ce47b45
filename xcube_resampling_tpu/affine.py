"""Affine resampling engine (same-CRS regular -> regular grids).

Behavioural port of reference affine.py:52-363 with the compute tier
redesigned for TPU: instead of dask_image's per-block scipy spline kernel,
the whole transform is one vectorized gather (:mod:`..ops.gather`) plus a
window reduction (:mod:`..ops.coarsen_ops`) for the downscale split — both
trace into a single fused XLA kernel on device, or run in float64 numpy on
the host.  NaN recovery is the same two-pass mask trick as the reference
(affine.py:344-360).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Sequence

import numpy as np

from .constants import (
    AffineTransformMatrix,
    AggFunction,
    AggMethods,
    FillValues,
    FloatInt,
    InterpMethodInt,
    InterpMethods,
    RecoverNans,
)
from .gridmapping import GridMapping
from .profiling import GLOBAL_TIMER as TIMER
from .ops import coarsen_ops, gather
from .utils import (
    _can_apply_affine_transform,
    _get_agg_method,
    _get_fill_value,
    _get_interp_method_int,
    _get_recover_nan,
    _select_variables,
    normalize_grid_mapping,
)
from .xrlite import DataArray, Dataset


def affine_transform_dataset(
    source_ds: Dataset,
    target_gm: GridMapping,
    source_gm: GridMapping | None = None,
    variables: str | Iterable[str] | None = None,
    interp_methods: InterpMethods | None = None,
    agg_methods: AggMethods | None = None,
    recover_nans: RecoverNans = False,
    fill_values: FillValues | None = None,
) -> Dataset:
    """Resample *source_ds* from *source_gm* to *target_gm* via the affine
    image-to-image transform (both regular, equal/compatible CRS).

    Option semantics (per-variable interp/agg/recover-NaN/fill resolution,
    dtype defaults) match the reference (affine.py:52-137)."""
    if source_gm is None:
        source_gm = GridMapping.from_dataset(source_ds)
    source_ds = normalize_grid_mapping(source_ds, source_gm)

    assert _can_apply_affine_transform(source_gm, target_gm), (
        f"Affine transformation cannot be applied to source CRS "
        f"{source_gm.crs.name!r} and target CRS {target_gm.crs.name!r}"
    )

    source_ds = _select_variables(source_ds, variables)

    target_ds = resample_dataset(
        source_ds,
        target_gm.ij_transform_to(source_gm),
        (source_gm.xy_dim_names[1], source_gm.xy_dim_names[0]),
        target_gm.size,
        target_gm.tile_size,
        interp_methods,
        agg_methods,
        recover_nans,
        fill_values,
    )

    # assign coordinates from the target grid mapping
    x_name, y_name = target_gm.xy_var_names
    target_ds = target_ds.assign_coords(
        {x_name: target_gm.x_coords, y_name: target_gm.y_coords}
    )

    return target_ds


def resample_dataset(
    dataset: Dataset,
    affine_matrix: AffineTransformMatrix,
    yx_dims: tuple[str, str],
    target_size: tuple[int, int],
    target_tile_size: tuple[int, int],
    interp_methods: InterpMethods | None = None,
    agg_methods: AggMethods | None = None,
    recover_nans: RecoverNans = False,
    fill_values: FillValues | None = None,
) -> Dataset:
    """Resample all variables with trailing *yx_dims* through the affine
    matrix; other variables are copied (1D-spatial variables are dropped),
    matching reference affine.py:140-240."""
    data_vars = dict()
    coords = dict()
    for var_name, data_array in dataset.variables.items():
        new_data_array = None
        if data_array.dims[-2:] == tuple(yx_dims):
            array = data_array.data
            output_shape = tuple(array.shape[:-2]) + (target_size[1], target_size[0])
            with TIMER("affine.resample"):
                resampled_array = _resample_array(
                    array,
                    affine_matrix,
                    output_shape,
                    _get_interp_method_int(
                        interp_methods, var_name, data_array
                    ),
                    _get_agg_method(agg_methods, var_name, data_array),
                    _get_recover_nan(recover_nans, var_name, data_array),
                    _get_fill_value(fill_values, var_name, data_array),
                )
            chunks = _output_chunks(
                data_array, output_shape, target_tile_size
            )
            new_data_array = DataArray(
                data=resampled_array,
                dims=data_array.dims,
                attrs=dict(data_array.attrs),
                chunks=chunks,
            )
        elif yx_dims[0] not in data_array.dims and yx_dims[1] not in data_array.dims:
            new_data_array = data_array
        if new_data_array is not None:
            if var_name in dataset.coords:
                coords[var_name] = new_data_array
            elif var_name in dataset.data_vars:
                data_vars[var_name] = new_data_array

    return Dataset(data_vars=data_vars, coords=coords, attrs=dict(dataset.attrs))


def _output_chunks(data_array, output_shape, target_tile_size):
    """Chunk metadata for a resampled variable: leading dims keep their
    first chunk size, spatial dims take the target tile size."""
    lead = []
    if data_array.chunks is not None:
        lead = [c[0] for c in data_array.chunks[:-2]]
    else:
        lead = list(output_shape[:-2])
    return tuple(lead) + (target_tile_size[1], target_tile_size[0])


def _resample_array(
    array,
    affine_matrix: AffineTransformMatrix,
    output_shape: Sequence[int],
    interp_method: InterpMethodInt,
    agg_method: AggFunction,
    recover_nan: bool,
    fill_value: FloatInt,
):
    if (affine_matrix[0][0] > 1 or affine_matrix[1][0] > 1) and interp_method != 0:
        return _downscale(
            array,
            affine_matrix,
            output_shape,
            agg_method,
            interp_method,
            recover_nan,
            fill_value,
        )
    return _upscale(
        array, affine_matrix, output_shape, interp_method, recover_nan, fill_value
    )


def _downscale(
    array,
    affine_matrix: AffineTransformMatrix,
    output_shape: Sequence[int],
    agg_method: AggFunction,
    interp_method: InterpMethodInt,
    recover_nan: bool,
    fill_value: FloatInt,
):
    """Downscale by splitting the scale into an integral window reduction
    and a residual (<=1) affine resample, reference affine.py:277-313."""
    ((i_scale, _, i_off), (_, j_scale, j_off)) = affine_matrix
    j_divisor = math.ceil(abs(j_scale))
    i_divisor = math.ceil(abs(i_scale))
    affine_matrix = (
        (i_scale / i_divisor, affine_matrix[0][1], affine_matrix[0][2]),
        (affine_matrix[1][0], j_scale / j_divisor, affine_matrix[1][2]),
    )
    upscaled_shape = tuple(output_shape[:-2]) + (
        output_shape[-2] * j_divisor,
        output_shape[-1] * i_divisor,
    )

    array = _upscale(
        array, affine_matrix, upscaled_shape, interp_method, recover_nan, fill_value
    )
    return coarsen_ops.coarsen(array, j_divisor, i_divisor, agg_method)


def _upscale(
    array,
    affine_matrix: AffineTransformMatrix,
    output_shape: Sequence[int],
    interp_method: InterpMethodInt,
    recover_nan: bool,
    fill_value: FloatInt,
):
    ((i_scale, _, i_off), (_, j_scale, j_off)) = affine_matrix
    if interp_method > 1:
        raise ValueError(
            "interp_methods must be one of 0, 1, 'nearest', 'bilinear'. "
            "Higher order is not supported for 3D arrays in affine transforms, "
            "as it causes unintended blending across the non-spatial (e.g., time) "
            "dimension."
        )

    out_h, out_w = output_shape[-2], output_shape[-1]
    xp = gather._get_xp(array)
    in_dtype = np.dtype(array.dtype)

    def transform(a, fill):
        return gather.affine_gather(
            a, j_scale, i_scale, j_off, i_off, out_h, out_w, interp_method, fill, xp=xp
        )

    if recover_nan and interp_method > 0:
        # "Recover" values neighbouring NaNs that would otherwise become NaN:
        # transform a zero-filled image and the inverted NaN mask separately,
        # then divide (reference affine.py:344-360)
        mask = xp.isnan(array)
        if bool(np.any(np.asarray(mask))) if xp is np else True:
            filled_im = xp.where(mask, 0.0, array)
            scaled_im = transform(filled_im, fill_value)
            scaled_norm = transform(1.0 - mask, fill_value)
            result = xp.where(
                xp.isclose(scaled_norm, 0.0), np.nan, scaled_im / scaled_norm
            )
            return _cast_back(result, in_dtype, xp)

    result = transform(array, fill_value)
    return _cast_back(result, in_dtype, xp)


def _cast_back(result, in_dtype, xp):
    if np.dtype(result.dtype) != in_dtype:
        if in_dtype.kind in "ui":
            result = xp.rint(result).astype(in_dtype)
        else:
            result = result.astype(in_dtype)
    return result
