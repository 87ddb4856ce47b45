"""Reprojection engine (regular -> regular grids across CRSs).

Behavioural port of reference reproject.py:51-530 with a TPU-first compute
design.  The reference stages pyproj host calls per dask block and gathers
through a uniformized source-window mosaic; here the coordinate transform is
the native CRS engine (float64 numpy on the host for the golden path — and
fully fused into the device kernel in ops/reproject fast path used by the
benchmarks), and per-target-tile source windows are sliced directly from the
(padded) source array with static, uniform shapes — the shape discipline XLA
needs, identical numerics to the reference's mosaic.
"""

from __future__ import annotations

import math
from collections.abc import Hashable, Iterable

import numpy as np

from .affine import affine_transform_dataset
from .constants import (
    LOG,
    SCALE_LIMIT,
    AggMethods,
    FillValues,
    InterpMethods,
    RecoverNans,
)
from .crs import Transformer
from .gridmapping import GridMapping
from .profiling import GLOBAL_TIMER as TIMER
from .ops import gather
from .utils import (
    _get_fill_value,
    _get_interp_method_str,
    _prep_interp_methods_downscale,
    _select_variables,
    clip_dataset_by_bbox,
    normalize_grid_mapping,
)
from .xrlite import DataArray, Dataset


def reproject_dataset(
    source_ds: Dataset,
    target_gm: GridMapping,
    source_gm: GridMapping | None = None,
    variables: str | Iterable[str] | None = None,
    interp_methods: InterpMethods | None = None,
    agg_methods: AggMethods | None = None,
    recover_nans: RecoverNans = False,
    fill_values: FillValues | None = None,
) -> Dataset:
    """Reproject a dataset's 2D spatial variables into the CRS and grid of
    *target_gm*.  Per-variable interpolation/aggregation/fill options follow
    the reference semantics (reproject.py:51-111)."""
    with TIMER("reproject.gm_inference"):
        if source_gm is None:
            source_gm = GridMapping.from_dataset(source_ds)
        if source_gm.is_j_axis_up:
            v_var = source_gm.xy_var_names[1]
            source_ds = source_ds.isel({v_var: slice(None, None, -1)})
            source_gm = GridMapping.from_dataset(source_ds)

        source_ds = normalize_grid_mapping(source_ds, source_gm)

        source_ds = _select_variables(source_ds, variables)

        transformer = Transformer.from_crs(
            target_gm.crs, source_gm.crs, always_xy=True
        )

    # If the source resolution is finer than the target's, downscale first
    with TIMER("reproject.pre_downscale"):
        source_ds, source_gm = _downscale_source_dataset(
            source_ds,
            source_gm,
            target_gm,
            transformer,
            interp_methods,
            agg_methods,
            recover_nans,
        )

    # Per target tile: source pixel window (uniformized to the largest) and
    # window origin coordinates; plus source padding for windows that poke
    # outside the source extent
    with TIMER("reproject.plan"):
        scr_ij_bboxes, x_coords, y_coords, pad_width = _get_scr_bboxes_indices(
            transformer, source_gm, target_gm
        )

        # Inverse-transform the target pixel-center grid into source
        # coordinates
        source_xx, source_yy = _transform_gridpoints(transformer, target_gm)

    # Assemble the target dataset
    x_name, y_name = source_gm.xy_var_names
    coords_ds = source_ds.coords.to_dataset()
    coords_ds = coords_ds.drop_vars((x_name, y_name))
    x_name, y_name = target_gm.xy_var_names
    coords = dict(coords_ds.coords)
    coords[x_name] = target_gm.x_coords
    coords[y_name] = target_gm.y_coords
    coords["spatial_ref"] = DataArray(
        np.array(0), dims=(), attrs=target_gm.crs.to_cf()
    )
    target_ds = Dataset(coords=coords, attrs=dict(source_ds.attrs))

    yx_dims = (source_gm.xy_dim_names[1], source_gm.xy_dim_names[0])
    for var_name, data_array in source_ds.items():
        if data_array.dims[-2:] == yx_dims:
            assert len(data_array.dims) in (
                2,
                3,
            ), f"Data variable {var_name} has {len(data_array.dims)} dimensions."

            target_ds[var_name] = _reproject_data_array(
                data_array,
                var_name,
                source_gm,
                target_gm,
                source_xx,
                source_yy,
                x_coords,
                y_coords,
                scr_ij_bboxes,
                pad_width,
                interp_methods,
                fill_values,
            )
        elif yx_dims[0] not in data_array.dims and yx_dims[1] not in data_array.dims:
            target_ds[var_name] = data_array

    return target_ds


def _is_jax_array(data) -> bool:
    return type(data).__module__.startswith("jax")


def _reproject_data_array(
    data_array: DataArray,
    var_name: Hashable,
    source_gm: GridMapping,
    target_gm: GridMapping,
    source_xx: np.ndarray,
    source_yy: np.ndarray,
    x_coords: np.ndarray,
    y_coords: np.ndarray,
    scr_ij_bboxes: np.ndarray,
    pad_width: tuple,
    interp_methods: InterpMethods | None = None,
    fill_values: FillValues | None = None,
) -> DataArray:
    data_array_expanded = False
    if len(data_array.dims) == 2:
        data_array = data_array.expand_dims({"dummy": 1})
        data_array_expanded = True

    fill_value = _get_fill_value(fill_values, var_name, data_array)
    interp_method = _get_interp_method_str(interp_methods, var_name, data_array)

    if _is_jax_array(data_array.data):
        # device fast path: variables backed by JAX arrays stay on device
        # and run through the fused kernels (SRW when the mapping allows,
        # XLA gather otherwise); results use the approximate coordinate
        # field (sub-1e-2 px), see ops/reproject_ops
        with TIMER("reproject.device"):
            out = _reproject_on_device(
                data_array.data, source_gm, target_gm, interp_method,
                fill_value,
            )
        return _finish_reprojected(
            data_array, out, target_gm, data_array_expanded
        )

    array = np.asarray(data_array.data)
    with TIMER("reproject.host_gather"):
        data_in = np.pad(
            array, pad_width, mode="constant", constant_values=fill_value
        )

    num_tiles_y, num_tiles_x = scr_ij_bboxes.shape[1], scr_ij_bboxes.shape[2]
    tile_h, tile_w = target_gm.tile_height, target_gm.tile_width
    out_h, out_w = target_gm.height, target_gm.width
    out = np.empty(array.shape[:-2] + (out_h, out_w), dtype=array.dtype)

    with TIMER("reproject.host_kernel"):
      for tj in range(num_tiles_y):
        for ti in range(num_tiles_x):
            j0, j1 = tj * tile_h, min((tj + 1) * tile_h, out_h)
            i0, i1 = ti * tile_w, min((ti + 1) * tile_w, out_w)
            sxx = source_xx[j0:j1, i0:i1]
            syy = source_yy[j0:j1, i0:i1]
            bbox = scr_ij_bboxes[:, tj, ti]
            window = data_in[..., bbox[1] : bbox[3], bbox[0] : bbox[2]]
            ix = (sxx - x_coords[0, tj, ti]) / source_gm.x_res
            iy = (syy - y_coords[0, tj, ti]) / -source_gm.y_res
            out[..., j0:j1, i0:i1] = _reproject_block(
                window, ix, iy, interp_method, array.dtype
            )

    return _finish_reprojected(data_array, out, target_gm, data_array_expanded)


def _reproject_on_device(data, source_gm, target_gm, interp_method, fill_value):
    import os

    from .ops.esw import make_esw_reproject_fn
    from .ops.reproject_ops import make_fused_reproject_fn
    from .ops.srw import make_region_reproject_fn, make_srw_reproject_fn

    # Engine tiers (measured on one v5e chip, 4096^2 bilinear):
    #   1. gated two-pass SRW   ~8 Gpix/s   positions <= ~0.05 px of direct
    #      (mild warps only: the slope gate rejects rotation-heavy cases)
    #   2. exact separable warp ~2.4 Gpix/s mild / ~0.8 Gpix/s severe —
    #      reproduces the direct gather kernel (bit-exact nearest, <= 2
    #      ulp bilinear), covers local rotation slopes to ~4 px/px
    #   3. exact region mosaic  ~120 Mpix/s — domain-scale warps with a
    #      projection singularity inside the target; same exact
    #      semantics, one-time multi-kernel compile per geometry
    #   4. XLA gather           ~20 Mpix/s  exact, no planning constraints
    # XRTPU_EXACT=1 skips tier 1 (exact semantics everywhere);
    # XRTPU_FAST_EXTREME_WARP=1 swaps tier 3 for the two-pass region
    # mosaic (fastest extreme-warp mode, two-pass filter semantics);
    # XRTPU_NO_EXACT_MOSAIC=1 skips tier 3 (gather instead — avoids the
    # one-time compile for throwaway geometries).
    fn = None
    if os.environ.get("XRTPU_EXACT", "") != "1":
        fn = make_srw_reproject_fn(
            source_gm, target_gm, interp_method, fill_value
        )
    if fn is None and os.environ.get("XRTPU_FAST_EXTREME_WARP", "") == "1":
        fn = make_region_reproject_fn(
            source_gm, target_gm, interp_method, fill_value
        )
    if fn is None:
        fn = make_esw_reproject_fn(
            source_gm, target_gm, interp_method, fill_value
        )
    if fn is None and os.environ.get("XRTPU_NO_EXACT_MOSAIC", "") != "1":
        LOG.info(
            "reproject: domain-scale warp, building the exact region "
            "mosaic (one-time planning + compilation per geometry; set "
            "XRTPU_NO_EXACT_MOSAIC=1 to use the plain gather kernel)"
        )
        fn = make_region_reproject_fn(
            source_gm, target_gm, interp_method, fill_value, exact=True
        )
    if fn is None:
        fn = make_fused_reproject_fn(
            source_gm, target_gm, interp_method, fill_value
        )
    return fn(data)


def _finish_reprojected(data_array, out, target_gm, data_array_expanded):
    tile_h, tile_w = target_gm.tile_height, target_gm.tile_width
    chunks = None
    if data_array.chunks is not None:
        chunks = tuple(c[0] for c in data_array.chunks[:-2]) + (tile_h, tile_w)

    if data_array_expanded:
        out = out[0, :, :]
        dims = (target_gm.xy_dim_names[1], target_gm.xy_dim_names[0])
        if chunks is not None:
            chunks = chunks[1:]
    else:
        dims = (
            data_array.dims[0],
            target_gm.xy_dim_names[1],
            target_gm.xy_dim_names[0],
        )
    return DataArray(data=out, dims=dims, attrs=dict(data_array.attrs), chunks=chunks)


def _reproject_block(window, ix, iy, interp_method, out_dtype):
    """Per-tile gather + interpolation (reference reproject.py:268-335 math,
    int32 indices — the reference's int16 cast limited padded windows to 32k
    pixels; that constraint is consciously lifted here)."""
    result = gather.grid_sample(window, ix, iy, interp_method)
    if np.dtype(out_dtype) != result.dtype:
        result = np.rint(result).astype(out_dtype) if np.dtype(
            out_dtype
        ).kind in "ui" else result.astype(out_dtype)
    return result


def _downscale_source_dataset(
    source_ds: Dataset,
    source_gm: GridMapping,
    target_gm: GridMapping,
    transformer: Transformer,
    interp_methods: InterpMethods | None,
    agg_methods: AggMethods | None,
    recover_nans: RecoverNans,
) -> tuple[Dataset, GridMapping]:
    """Clip + affine-downscale the source when its resolution is finer than
    the target's (reference reproject.py:338-382; SCALE_LIMIT gate)."""
    bbox_trans = transformer.transform_bounds(*target_gm.xy_bbox)
    xres_trans = (bbox_trans[2] - bbox_trans[0]) / target_gm.width
    yres_trans = (bbox_trans[3] - bbox_trans[1]) / target_gm.height
    x_scale = source_gm.x_res / xres_trans
    y_scale = source_gm.y_res / yres_trans
    if x_scale < SCALE_LIMIT or y_scale < SCALE_LIMIT:
        bbox_trans = (
            bbox_trans[0] - 2 * source_gm.x_res,
            bbox_trans[1] - 2 * source_gm.y_res,
            bbox_trans[2] + 2 * source_gm.x_res,
            bbox_trans[3] + 2 * source_gm.y_res,
        )
        source_ds = clip_dataset_by_bbox(source_ds, bbox_trans, source_gm.xy_dim_names)
        source_gm = GridMapping.from_dataset(source_ds)
        w, h = round(x_scale * source_gm.width), round(y_scale * source_gm.height)
        downscaled_size = (w if w >= 2 else 2, h if h >= 2 else 2)
        downscale_target_gm = GridMapping.regular(
            size=downscaled_size,
            xy_min=(source_gm.xy_bbox[0], source_gm.xy_bbox[1]),
            xy_res=(xres_trans, yres_trans),
            crs=source_gm.crs,
            tile_size=source_gm.tile_size,
        )
        old_names = source_gm.xy_var_names
        old_dims = source_gm.xy_dim_names
        source_ds = affine_transform_dataset(
            source_ds,
            downscale_target_gm,
            source_gm=source_gm,
            interp_methods=_prep_interp_methods_downscale(interp_methods),
            agg_methods=agg_methods,
            recover_nans=recover_nans,
        )
        # the affine keeps variable dims from the source, but assigns
        # coords under the downscale GM's default names — for e.g. a
        # geographic dataset whose coords are named x/y the two diverge
        # and the dataset would stop being self-consistent (vars silently
        # skipped downstream).  Re-assign under the source's names.
        new_names = downscale_target_gm.xy_var_names
        if new_names != old_names:
            source_ds = source_ds.drop_vars(
                [n for n in new_names if n in source_ds.variables]
            ).assign_coords(
                {
                    old_names[0]: DataArray(
                        np.asarray(downscale_target_gm.x_coords.data),
                        dims=(old_dims[0],),
                    ),
                    old_names[1]: DataArray(
                        np.asarray(downscale_target_gm.y_coords.data),
                        dims=(old_dims[1],),
                    ),
                }
            )
        source_gm = GridMapping.from_dataset(source_ds)

    return source_ds, source_gm


def _get_scr_bboxes_indices(
    transformer: Transformer,
    source_gm: GridMapping,
    target_gm: GridMapping,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, tuple]:
    """Per-target-tile source pixel windows, uniformized to the largest
    window (static shapes), plus per-tile window-origin coordinate stacks
    and the source padding needed where windows exceed the source extent
    (reference reproject.py:385-469)."""
    num_tiles_x = math.ceil(target_gm.width / target_gm.tile_width)
    num_tiles_y = math.ceil(target_gm.height / target_gm.tile_height)

    # analytic per-tile source bboxes via densified bounds transform
    origin = (
        float(np.asarray(source_gm.x_coords.data)[0]),
        float(np.asarray(source_gm.y_coords.data)[0]),
    )
    scr_ij_bboxes = np.full((4, num_tiles_y, num_tiles_x), -1, dtype=np.int32)
    for idx, xy_bbox in enumerate(target_gm.xy_bboxes):
        j, i = np.unravel_index(idx, (num_tiles_y, num_tiles_x))
        source_xy_bbox = transformer.transform_bounds(*xy_bbox)
        i_min = math.floor((source_xy_bbox[0] - origin[0]) / source_gm.x_res)
        i_max = math.ceil((source_xy_bbox[2] - origin[0]) / source_gm.x_res)
        j_min = math.floor((origin[1] - source_xy_bbox[3]) / source_gm.y_res)
        j_max = math.ceil((origin[1] - source_xy_bbox[1]) / source_gm.y_res)
        scr_ij_bboxes[:, j, i] = [i_min, j_min, i_max, j_max]

    # Extend all windows to the largest one so every tile's source window
    # has the same (static) shape
    i_diff = scr_ij_bboxes[2] - scr_ij_bboxes[0]
    j_diff = scr_ij_bboxes[3] - scr_ij_bboxes[1]
    i_diff_max = int(np.max(i_diff)) + 1
    j_diff_max = int(np.max(j_diff)) + 1
    for i in range(num_tiles_x):
        for j in range(num_tiles_y):
            scr_ij_bbox = scr_ij_bboxes[:, j, i]

            i_half = (i_diff_max - i_diff[j, i]) // 2
            i_start = scr_ij_bbox[0] - i_half
            i_end = i_start + i_diff_max

            j_half = (j_diff_max - j_diff[j, i]) // 2
            j_start = scr_ij_bbox[1] - j_half
            j_end = j_start + j_diff_max

            scr_ij_bboxes[:, j, i] = [i_start, j_start, i_end, j_end]

    # Window-origin coordinates per tile.  float32 like the reference
    # (reproject.py:427-428): the goldens encode this quantization of the
    # window origin; the fused device path keeps full precision instead.
    x_coords = np.zeros((i_diff_max, num_tiles_y, num_tiles_x), dtype=np.float32)
    y_coords = np.zeros((j_diff_max, num_tiles_y, num_tiles_x), dtype=np.float32)
    i_min = int(np.min(scr_ij_bboxes[0]))
    i_max = int(np.max(scr_ij_bboxes[2]))
    j_min = int(np.min(scr_ij_bboxes[[1, 3]]))
    j_max = int(np.max(scr_ij_bboxes[[1, 3]]))
    x0 = float(np.asarray(source_gm.x_coords.data)[0])
    x_coord = x0 + (i_min + np.arange(i_max - i_min)) * source_gm.x_res
    y_vals = np.asarray(source_gm.y_coords.data)
    y_res_signed = float(y_vals[1] - y_vals[0])
    y_coord = float(y_vals[0]) + (j_min + np.arange(j_max - j_min)) * y_res_signed
    for i in range(num_tiles_x):
        for j in range(num_tiles_y):
            scr_ij_bbox = scr_ij_bboxes[:, j, i]

            i_start = scr_ij_bbox[0] - i_min
            i_end = i_start + i_diff_max
            x_coords[:, j, i] = x_coord[i_start:i_end]

            j_start = scr_ij_bbox[1] - j_min
            j_end = j_start + j_diff_max
            y_coords[:, j, i] = y_coord[j_start:j_end]

    pad_width = (
        (0, 0),
        (
            -min(0, int(j_min)),
            max(0, int(j_max - source_gm.height)),
        ),
        (
            -min(0, int(i_min)),
            max(0, int(i_max - source_gm.width)),
        ),
    )
    scr_ij_bboxes[[1, 3]] += pad_width[1][0]
    scr_ij_bboxes[[0, 2]] += pad_width[2][0]

    return scr_ij_bboxes, x_coords, y_coords, pad_width


def _transform_gridpoints(
    transformer: Transformer, target_gm: GridMapping
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse-transform all target pixel centers into source CRS
    coordinates (reference reproject.py:472-496; here a single vectorized
    float64 evaluation of the native projection pipeline)."""
    target_x = np.asarray(target_gm.x_coords.data, dtype=np.float64)
    target_y = np.asarray(target_gm.y_coords.data, dtype=np.float64)
    target_xx, target_yy = np.meshgrid(target_x, target_y)
    source_xx, source_yy = transformer.transform(target_xx, target_yy)
    return np.asarray(source_xx), np.asarray(source_yy)
