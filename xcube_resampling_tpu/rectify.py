"""Rectification engine (irregular 2D-coords swath -> regular grid).

Behavioural port of reference rectify.py:54-773 with the numba scatter
kernels redesigned as vectorized candidate-enumeration + scatter-min
(:mod:`.ops.rectify_ops`) — deterministic, parallel, bit-matching the
reference's first-writer-wins semantics.  Phase A produces a per-tile
(2, h, w) float64 fractional source-index map; Phase B is a shared gather
kernel.  Chunked execution is tile-static (one target tile = one kernel
call / one device tile), and the output is chunking-invariant by
construction (same guarantee the reference asserts via its dask tests,
test_rectify.py:295-388).
"""

from __future__ import annotations

import os
from collections.abc import Hashable, Iterable

import numpy as np

from .affine import resample_dataset
from .chunk import compute_array_from_func, get_block_iterators, get_chunk_sizes
from .constants import (
    SCALE_LIMIT,
    UV_DELTA,
    AggMethods,
    FillValues,
    FloatInt,
    InterpMethodStr,
    InterpMethods,
    RecoverNans,
)
from .crs import Transformer
from .gridmapping import GridMapping
from .ops import rectify_ops
from .profiling import GLOBAL_TIMER as TIMER
from .utils import (
    _get_fill_value,
    _get_interp_method_str,
    _is_equal_crs,
    _prep_interp_methods_downscale,
    _select_variables,
    normalize_grid_mapping,
)
from .xrlite import DataArray, Dataset


def rectify_dataset(
    source_ds: Dataset,
    target_gm: GridMapping | None = None,
    source_gm: GridMapping | None = None,
    variables: str | Iterable[str] | None = None,
    interp_methods: InterpMethods | None = None,
    agg_methods: AggMethods | None = None,
    recover_nans: RecoverNans = False,
    fill_values: FillValues | None = None,
    tile_size: int | tuple[int, int] | None = None,
) -> Dataset:
    """Rectify a dataset with non-regular (2D) spatial coordinates to a
    regular target grid.  Option semantics follow the reference
    (rectify.py:54-118)."""
    with TIMER("rectify.gm_inference"):
        if source_gm is None:
            source_gm = GridMapping.from_dataset(source_ds)
        source_ds = normalize_grid_mapping(source_ds, source_gm)

        if target_gm is None:
            target_gm = source_gm.to_regular(tile_size=tile_size)

    # transform the 2D source coordinates into the target CRS if needed
    if not _is_equal_crs(source_gm, target_gm):
        with TIMER("rectify.coord_transform"):
            source_ds = _transform_coords(source_ds, source_gm, target_gm)
            source_gm = GridMapping.from_dataset(source_ds)

    source_ds = _select_variables(source_ds, variables)

    # If source resolution is finer than the target's, downscale first
    with TIMER("rectify.pre_downscale"):
        source_ds, source_gm = _downscale_source_dataset(
            source_ds,
            source_gm,
            target_gm,
            interp_methods,
            agg_methods,
            recover_nans,
        )

    # PHASE A: per-target-pixel fractional source indices
    with TIMER("rectify.phase_a"):
        target_source_ij = _compute_target_source_ij(
            source_gm, target_gm, UV_DELTA
        )

    # assemble target dataset
    x_name, y_name = source_gm.xy_var_names
    coords_ds = source_ds.coords.to_dataset()
    coords_ds = coords_ds.drop_vars((x_name, y_name))
    x_name, y_name = target_gm.xy_var_names
    target_coords = target_gm.to_coords()
    coords = dict(coords_ds.coords)
    coords[x_name] = target_coords[x_name]
    coords[y_name] = target_coords[y_name]
    coords["spatial_ref"] = DataArray(
        np.array(0), dims=(), attrs=target_gm.crs.to_cf()
    )
    target_ds = Dataset(coords=coords, attrs=dict(source_ds.attrs))

    yx_dims = (source_gm.xy_dim_names[1], source_gm.xy_dim_names[0])
    with TIMER("rectify.phase_b"):
        for var_name, data_array in source_ds.data_vars.items():
            if data_array.dims[-2:] == yx_dims:
                assert len(data_array.dims) in (
                    2,
                    3,
                ), f"Data variable {var_name} has {len(data_array.dims)} dimensions."

                target_ds[var_name] = _rectify_data_array(
                    data_array,
                    var_name,
                    target_gm,
                    target_source_ij,
                    interp_methods,
                    fill_values,
                )

            elif (
                yx_dims[0] not in data_array.dims
                and yx_dims[1] not in data_array.dims
            ):
                target_ds[var_name] = data_array

    return target_ds


def _transform_coords(
    source_ds: Dataset,
    source_gm: GridMapping,
    target_gm: GridMapping,
) -> Dataset:
    """Forward-transform the source's 2D coordinate images into the target
    CRS (reference rectify.py:182-231; native transformer instead of a
    per-block pyproj callback)."""
    source_xx = np.asarray(source_gm.x_coords.data, dtype=np.float64)
    source_yy = np.asarray(source_gm.y_coords.data, dtype=np.float64)

    transformer_forward = Transformer.from_crs(
        source_gm.crs, target_gm.crs, always_xy=True
    )
    target_xx, target_yy = transformer_forward.transform(source_xx, source_yy)

    source_ds = source_ds.drop_vars(source_gm.xy_var_names)
    yx_dims = (source_gm.xy_dim_names[1], source_gm.xy_dim_names[0])
    yx_var_names = (
        ("lon", "lat")
        if target_gm.crs.is_geographic
        else ("transformed_x", "transformed_y")
    )
    source_ds = source_ds.assign_coords(
        {
            "spatial_ref": DataArray(
                np.array(0), dims=(), attrs=target_gm.crs.to_cf()
            ),
            yx_var_names[0]: (yx_dims, np.asarray(target_xx)),
            yx_var_names[1]: (yx_dims, np.asarray(target_yy)),
        }
    )

    return source_ds


def _downscale_source_dataset(
    source_ds: Dataset,
    source_gm: GridMapping,
    target_gm: GridMapping,
    interp_methods: InterpMethods | None,
    agg_methods: AggMethods | None,
    recover_nans: RecoverNans,
) -> tuple[Dataset, GridMapping]:
    """Pre-downscale when source resolution is finer than target
    (reference rectify.py:234-260)."""
    x_scale = source_gm.x_res / target_gm.x_res
    y_scale = source_gm.y_res / target_gm.y_res
    if x_scale < SCALE_LIMIT or y_scale < SCALE_LIMIT:
        w, h = round(x_scale * source_gm.width), round(y_scale * source_gm.height)
        downscaled_size = (w if w >= 2 else 2, h if h >= 2 else 2)

        source_ds = resample_dataset(
            source_ds,
            ((1 / x_scale, 0, 0), (0, 1 / y_scale, 0)),
            (source_gm.xy_dim_names[1], source_gm.xy_dim_names[0]),
            downscaled_size,
            source_gm.tile_size,
            _prep_interp_methods_downscale(interp_methods),
            agg_methods,
            recover_nans,
        )
        source_gm = GridMapping.from_dataset(source_ds)

    return source_ds, source_gm


def _compute_target_source_ij(
    src_geo_coding: GridMapping, output_geom: GridMapping, uv_delta: float
) -> np.ndarray:
    """PHASE A: the (2, height, width) fractional source-index map,
    computed tile by tile with per-tile source windows discovered by the
    bbox scan (reference rectify.py:312-370)."""
    dst_width = output_geom.width
    dst_height = output_geom.height
    dst_tile_width = output_geom.tile_width
    dst_tile_height = output_geom.tile_height
    dst_var_shape = 2, dst_height, dst_width
    dst_var_chunks = 2, dst_tile_height, dst_tile_width

    dst_x_min, dst_y_min, dst_x_max, dst_y_max = output_geom.xy_bbox
    dst_x_res, dst_y_res = output_geom.xy_res
    dst_is_j_axis_up = output_geom.is_j_axis_up

    # Empirical xy_border grows per-tile search windows: more tiles means
    # smaller destination bboxes and a higher risk of missing source quads
    # near tile edges (reference rectify.py:329-340)
    num_tiles_x = dst_width / dst_tile_width
    num_tiles_y = dst_height / dst_tile_height
    xy_border = min(
        min(
            2 * num_tiles_x * output_geom.x_res, 2 * num_tiles_y * output_geom.y_res
        ),
        min(0.5 * (dst_x_max - dst_x_min), 0.5 * (dst_y_max - dst_y_min)),
    )

    # tiered dispatch: when a JAX accelerator is present (or the device
    # tier is forced), the whole map is computed in one device kernel —
    # the reference's numba hot loop stays on the TPU, the host only
    # normalizes coordinates and sizes the candidate rectangle.  The
    # tiled host path (multithreaded C++ / vectorized numpy) remains the
    # fallback for geometries outside the device kernel's envelope.
    mode = os.environ.get("XRTPU_PHASEA", "auto")
    use_device = mode == "device"
    if mode == "auto":
        try:
            import jax

            use_device = jax.default_backend() not in ("cpu",)
        except Exception:  # noqa: BLE001
            use_device = False
    if use_device:
        with TIMER("rectify.phase_a_device"):
            src_xy = np.asarray(
                src_geo_coding.xy_coords.data, dtype=np.float64
            )
            device_map = rectify_ops.inverse_ij_map_device(
                src_xy[0],
                src_xy[1],
                0,
                0,
                (dst_height, dst_width),
                dst_x_min,
                dst_y_min if dst_is_j_axis_up else dst_y_max,
                dst_x_res,
                dst_y_res if dst_is_j_axis_up else -dst_y_res,
                uv_delta,
            )
        if device_map is not None:
            return device_map

    with TIMER("rectify.phase_a_bbox_scan"):
        dst_xy_bboxes = output_geom.xy_bboxes
        src_ij_bboxes = src_geo_coding.ij_bboxes_from_xy_bboxes(
            dst_xy_bboxes, xy_border=xy_border, ij_border=1
        )

    return compute_array_from_func(
        _compute_target_source_ij_block,
        dst_var_shape,
        dst_var_chunks,
        np.float64,
        ctx_arg_names=[
            "dtype",
            "block_id",
            "block_shape",
            "block_slices",
        ],
        args=(
            src_geo_coding.xy_coords,
            src_ij_bboxes,
            dst_x_min,
            dst_y_min,
            dst_y_max,
            dst_x_res,
            dst_y_res,
            dst_is_j_axis_up,
            uv_delta,
        ),
        name="ij_pixels",
    )


def _compute_target_source_ij_block(
    dtype: np.dtype,
    block_id: int,
    block_shape: tuple[int, ...],
    block_slices: tuple,
    src_xy_coords: DataArray,
    src_ij_bboxes: np.ndarray,
    dst_x_min: float,
    dst_y_min: float,
    dst_y_max: float,
    dst_x_res: float,
    dst_y_res: float,
    dst_is_j_axis_up: bool,
    uv_delta: float,
) -> np.ndarray:
    """One destination tile of the fractional source-index map
    (reference rectify.py:373-419)."""
    _, (dst_y_slice_start, _), (dst_x_slice_start, _) = block_slices
    src_ij_bbox = src_ij_bboxes[block_id]
    src_i_min, src_j_min, src_i_max, src_j_max = src_ij_bbox
    if src_i_min == -1:
        return np.full(block_shape, np.nan, dtype=dtype)
    src_xy_values = np.asarray(
        src_xy_coords.data[
            :, src_j_min : src_j_max + 1, src_i_min : src_i_max + 1
        ],
        dtype=np.float64,
    )
    src_x_values = src_xy_values[0]
    src_y_values = src_xy_values[1]
    dst_x_offset = dst_x_min + dst_x_slice_start * dst_x_res
    if dst_is_j_axis_up:
        dst_y_offset = dst_y_min + dst_y_slice_start * dst_y_res
    else:
        dst_y_offset = dst_y_max - dst_y_slice_start * dst_y_res
    return rectify_ops.inverse_ij_map(
        src_x_values,
        src_y_values,
        int(src_i_min),
        int(src_j_min),
        (block_shape[1], block_shape[2]),
        dst_x_offset,
        dst_y_offset,
        dst_x_res,
        dst_y_res if dst_is_j_axis_up else -dst_y_res,
        uv_delta,
    )


def _rectify_data_array(
    data_array: DataArray,
    var_name: Hashable,
    target_gm: GridMapping,
    target_source_ij: np.ndarray,
    interp_methods: InterpMethods | None = None,
    fill_values: FillValues | None = None,
) -> DataArray:
    """PHASE B: gather a data variable through the source-index map
    (reference rectify.py:263-309)."""
    data_array_expanded = False
    if len(data_array.dims) == 2:
        data_array = data_array.expand_dims({"dummy": 1})
        data_array_expanded = True

    fill_value = _get_fill_value(fill_values, var_name, data_array)
    interp_method = _get_interp_method_str(interp_methods, var_name, data_array)

    if isinstance(target_source_ij, rectify_ops.DeviceIJMap):
        # fully device-resident pipeline: the Phase-A map stays on the
        # device and every variable (numpy- or JAX-backed) gathers
        # through it there — nothing crosses the host boundary per band
        fn = rectify_ops.make_device_var_image_fn_resident(
            target_source_ij, fill_value, interp_method
        )
        array_rectified = fn(data_array.data)
    elif type(data_array.data).__module__.startswith("jax"):
        # device fast path over a host-materialized map: JAX-backed
        # variables gather through the fractional index map on device
        # (the map is staged once and reused for every variable)
        fn = rectify_ops.make_device_var_image_fn(
            target_source_ij,
            (data_array.shape[-2], data_array.shape[-1]),
            fill_value,
            interp_method,
        )
        array_rectified = fn(data_array.data)
    else:
        array_rectified = _compute_var_image(
            np.asarray(data_array.data),
            target_source_ij,
            fill_value,
            interp_method,
            target_gm,
        )

    tile_h, tile_w = target_gm.tile_height, target_gm.tile_width
    if data_array_expanded:
        array_rectified = array_rectified[0, :, :]
        dims = (target_gm.xy_dim_names[1], target_gm.xy_dim_names[0])
        chunks = (tile_h, tile_w) if target_gm.is_tiled else None
    else:
        dims = (
            data_array.dims[0],
            target_gm.xy_dim_names[1],
            target_gm.xy_dim_names[0],
        )
        lead = (
            data_array.chunks[0][0]
            if data_array.chunks is not None
            else data_array.shape[0]
        )
        chunks = (lead, tile_h, tile_w)

    return DataArray(
        data=array_rectified,
        dims=dims,
        attrs=dict(data_array.attrs),
        chunks=chunks,
    )


def _compute_var_image(
    src_var: np.ndarray,
    dst_src_ij_images: np.ndarray,
    fill_value: FloatInt,
    interp_method: InterpMethodStr,
    target_gm: GridMapping,
) -> np.ndarray:
    """Gather tile by tile so the per-tile source windows stay small
    (reference rectify.py:579-635)."""
    dst_h, dst_w = dst_src_ij_images.shape[-2], dst_src_ij_images.shape[-1]
    out = np.empty(src_var.shape[:-2] + (dst_h, dst_w), dtype=src_var.dtype)
    chunk_sizes = tuple(
        get_chunk_sizes(
            (dst_h, dst_w), (target_gm.tile_height, target_gm.tile_width)
        )
    )
    _, _, block_slices = get_block_iterators(chunk_sizes)
    for y_slice, x_slice in block_slices:
        ij_block = dst_src_ij_images[:, y_slice, x_slice]
        out[..., y_slice, x_slice] = rectify_ops.var_image_from_ij_map(
            src_var, ij_block, fill_value, interp_method
        )
    return out
