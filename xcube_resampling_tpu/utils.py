"""Dataset helpers and per-variable option resolution.

Behavioural port of reference utils.py
(/root/reference/xcube_resampling/utils.py:47-332): spatial-dim detection,
bbox clipping, grid-mapping normalization to a ``spatial_ref`` coordinate,
variable selection, and resolution of per-variable / per-dtype interpolation,
aggregation, NaN-recovery and fill-value options with dtype-derived defaults.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable, Iterable, Mapping, Sequence

import numpy as np

from .constants import (
    AGG_METHODS,
    FILLVALUE_FLOAT,
    FILLVALUE_INT,
    FILLVALUE_UINT8,
    FILLVALUE_UINT16,
    INTERP_METHOD_MAPPING,
    LOG,
    AggMethod,
    AggMethods,
    FloatInt,
    InterpMethod,
    InterpMethodInt,
    InterpMethodStr,
    InterpMethods,
    RecoverNans,
)
from .gridmapping import GridMapping
from .xrlite import DataArray, Dataset


def get_spatial_dims(ds: Dataset) -> tuple[str, str]:
    """Identify the horizontal spatial dimension names of *ds* as
    (x_dim, y_dim): ("lon", "lat") or ("x", "y")."""
    if "lat" in ds and "lon" in ds:
        x_coord, y_coord = "lon", "lat"
    elif "y" in ds and "x" in ds:
        x_coord, y_coord = "x", "y"
    else:
        raise KeyError(
            f"No standard spatial dimensions found in dataset. "
            f"Expected pairs ('lon', 'lat') or ('x', 'y'), "
            f"but found: {list(ds.dims)}."
        )
    return x_coord, y_coord


def clip_dataset_by_bbox(
    ds: Dataset,
    bbox: Sequence[FloatInt],
    spatial_dims: tuple[str, str] | None = None,
) -> Dataset:
    """Clip *ds* to bounding box (min_x, min_y, max_x, max_y), handling both
    y-axis orientations."""
    if len(bbox) != 4:
        raise ValueError(f"Expected bbox of length 4, got: {bbox}")

    if spatial_dims is None:
        spatial_dims = get_spatial_dims(ds)
    x_dim, y_dim = spatial_dims

    y_vals = np.asarray(ds[y_dim].data)
    if y_vals[-1] - y_vals[0] < 0:
        ds = ds.sel({x_dim: slice(bbox[0], bbox[2]), y_dim: slice(bbox[3], bbox[1])})
    else:
        ds = ds.sel({x_dim: slice(bbox[0], bbox[2]), y_dim: slice(bbox[1], bbox[3])})

    if any(size == 0 for size in ds.sizes.values()):
        LOG.warning(
            "Clipped dataset contains at least one zero-sized dimension. "
            f"Check if the bounding box {bbox} overlaps with the dataset extent."
        )
    return ds


def normalize_grid_mapping(ds: Dataset, gm: GridMapping) -> Dataset:
    """Replace any existing grid-mapping variable with a standard
    ``spatial_ref`` coordinate carrying CF CRS attributes, and point every
    data variable's ``grid_mapping`` attribute at it."""
    gm_name = _get_grid_mapping_name(ds)
    if gm_name is not None:
        ds = ds.drop_vars(gm_name)
    ds = ds.assign_coords(
        spatial_ref=DataArray(np.array(0), dims=(), attrs=gm.crs.to_cf())
    )
    out = ds.copy()
    for var_name in list(out.data_vars):
        var = out.data_vars[var_name].copy()
        var.attrs["grid_mapping"] = "spatial_ref"
        out.data_vars[var_name] = var
    return out


def _select_variables(
    ds: Dataset, variables: str | Iterable[str] | None = None
) -> Dataset:
    if variables is not None:
        if isinstance(variables, str):
            variables = [variables]
        ds = ds[list(variables)]
    return ds


def _get_grid_mapping_name(ds: Dataset) -> str | None:
    gm_names = []
    for var in ds.data_vars:
        if "grid_mapping" in ds.data_vars[var].attrs:
            gm_names.append(ds.data_vars[var].attrs["grid_mapping"])
    if "crs" in ds:
        gm_names.append("crs")
    if "spatial_ref" in ds.coords:
        gm_names.append("spatial_ref")
    gm_names = np.unique(gm_names)
    assert len(gm_names) <= 1, "Multiple grid mapping names found."
    if len(gm_names) == 1:
        return str(gm_names[0])
    else:
        return None


def _can_apply_affine_transform(source_gm: GridMapping, target_gm: GridMapping) -> bool:
    GridMapping.assert_regular(source_gm, name="source_gm")
    GridMapping.assert_regular(target_gm, name="target_gm")
    return _is_equal_crs(source_gm, target_gm)


def _is_equal_crs(source_gm: GridMapping, target_gm: GridMapping) -> bool:
    geographic = source_gm.crs.is_geographic and target_gm.crs.is_geographic
    return geographic or source_gm.crs.equals(target_gm.crs)


def _get_interp_method(
    interp_methods: InterpMethods | None,
    key: Hashable,
    var: DataArray,
) -> InterpMethod:
    def assign_defaults(data_type: np.dtype) -> InterpMethod:
        return 0 if np.issubdtype(data_type, np.integer) else 1

    if isinstance(interp_methods, Mapping):
        interp_method = interp_methods.get(str(key), interp_methods.get(var.dtype))
        if interp_method is None:
            LOG.warning(
                f"Interpolation method could not be derived from the mapping "
                f"`interp_methods` for data variable {key!r} with data type "
                f"{var.dtype!r}. Defaults are assigned."
            )
            interp_method = assign_defaults(var.dtype)
    elif isinstance(interp_methods, int) or isinstance(interp_methods, str):
        interp_method = interp_methods
    else:
        interp_method = assign_defaults(var.dtype)

    return interp_method


def _get_interp_method_int(
    interp_methods: InterpMethods | None,
    key: Hashable,
    var: DataArray,
) -> InterpMethodInt:
    interp_method = _get_interp_method(interp_methods, key, var)
    if isinstance(interp_method, str):
        interp_method = INTERP_METHOD_MAPPING[interp_method]
    return interp_method


def _get_interp_method_str(
    interp_methods: InterpMethods | None,
    key: Hashable,
    var: DataArray,
) -> InterpMethodStr:
    interp_method = _get_interp_method(interp_methods, key, var)
    if isinstance(interp_method, int):
        interp_method = INTERP_METHOD_MAPPING[interp_method]
    return interp_method


def _prep_interp_methods_downscale(
    interp_methods: InterpMethods | None,
) -> InterpMethods | None:
    # triangular degrades to bilinear when pre-downscaling
    if interp_methods == "triangular":
        return "bilinear"
    elif (
        isinstance(interp_methods, Mapping) and "triangular" in interp_methods.values()
    ):
        return {
            k: ("bilinear" if v == "triangular" else v)
            for k, v in interp_methods.items()
        }
    return interp_methods


def _get_agg_method(
    agg_methods: AggMethods | None,
    key: Hashable,
    var: DataArray,
) -> Callable:
    def assign_defaults(data_type: np.dtype) -> AggMethod:
        return "center" if np.issubdtype(data_type, np.integer) else "mean"

    if isinstance(agg_methods, Mapping):
        agg_method = agg_methods.get(str(key), agg_methods.get(var.dtype))
        if agg_method is None:
            LOG.warning(
                f"Aggregation method could not be derived from the mapping "
                f"`agg_methods` for data variable {key!r} with data type "
                f"{var.dtype!r}. Defaults are assigned."
            )
            agg_method = assign_defaults(var.dtype)
    elif isinstance(agg_methods, str):
        agg_method = agg_methods
    else:
        agg_method = assign_defaults(var.dtype)

    return AGG_METHODS[agg_method]


def _get_recover_nan(
    recover_nans: RecoverNans | None,
    key: Hashable,
    var: DataArray,
) -> bool:
    if isinstance(recover_nans, Mapping):
        recover_nan = recover_nans.get(str(key), recover_nans.get(var.dtype))
        if recover_nan is None:
            LOG.warning(
                f"The method to recover nan could not be derived from the mapping "
                f"`recover_nans`  for data variable {key!r} with data type "
                f"{var.dtype!r}. Defaults are assigned."
            )
            recover_nan = False
    elif isinstance(recover_nans, bool):
        recover_nan = recover_nans
    else:
        recover_nan = False

    return recover_nan


def _get_fill_value(
    fill_values: FloatInt | Mapping[np.dtype | str, FloatInt] | None,
    key: Hashable,
    var: DataArray,
) -> FloatInt:
    def assign_defaults(data_type: np.dtype) -> FloatInt:
        if data_type == np.uint8:
            fill_value = FILLVALUE_UINT8
        elif data_type == np.uint16:
            fill_value = FILLVALUE_UINT16
        elif np.issubdtype(data_type, np.integer):
            fill_value = FILLVALUE_INT
        else:
            fill_value = FILLVALUE_FLOAT
        return fill_value

    if isinstance(fill_values, Mapping):
        fill_value = fill_values.get(str(key), fill_values.get(var.dtype))
        if fill_value is None:
            LOG.warning(
                f"Fill value could not be derived from the mapping `fill_values` "
                f"for data variable {key!r} with data type {var.dtype!r}. Defaults "
                f"are assigned."
            )
            fill_value = assign_defaults(var.dtype)
    elif fill_values is not None:
        fill_value = fill_values
    else:
        fill_value = assign_defaults(var.dtype)

    return fill_value
