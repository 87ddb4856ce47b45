"""Option resolution and dataset helper behaviour (port of reference
tests/test_utils.py)."""

import logging

import numpy as np
import pytest

from xcube_resampling_tpu.constants import (
    AGG_METHODS,
    FILLVALUE_INT,
    FILLVALUE_UINT8,
    FILLVALUE_UINT16,
)
from xcube_resampling_tpu.utils import (
    _get_agg_method,
    _get_fill_value,
    _get_grid_mapping_name,
    _get_interp_method,
    _get_recover_nan,
    _prep_interp_methods_downscale,
    _select_variables,
    clip_dataset_by_bbox,
    get_spatial_dims,
)
from xcube_resampling_tpu.xrlite import DataArray, Dataset


def test_get_spatial_dims_lon_lat():
    ds = Dataset(coords={"lon": [0, 1], "lat": [0, 1]})
    assert ("lon", "lat") == get_spatial_dims(ds)


def test_get_spatial_dims_x_y():
    ds = Dataset(coords={"x": [0, 1], "y": [0, 1]})
    assert ("x", "y") == get_spatial_dims(ds)


def test_get_spatial_dims_missing_dims():
    ds = Dataset(coords={"time": [0, 1]})
    with pytest.raises(KeyError, match="No standard spatial dimensions found"):
        get_spatial_dims(ds)


def test_clip_dataset_by_bbox_invalid_bbox():
    ds = Dataset()
    with pytest.raises(ValueError, match="Expected bbox of length 4"):
        clip_dataset_by_bbox(ds, bbox=[0, 0, 1])


def test_clip_dataset_by_bbox(caplog):
    ds = Dataset(
        {"data": (("lat", "lon"), [[1, 2], [3, 4]])},
        coords={"lon": [0, 1], "lat": [0, 1]},
    )
    clipped = clip_dataset_by_bbox(ds, bbox=[1, 1, 2, 2])
    assert clipped.sizes["lat"] == 1
    assert clipped.sizes["lon"] == 1

    with caplog.at_level(logging.WARNING, logger="xcube.resampling"):
        _ = clip_dataset_by_bbox(ds, bbox=[10, 10, 20, 20])
    assert "Clipped dataset contains at least one zero-sized dimension." in caplog.text


def test_select_variables():
    ds = Dataset(
        {
            "var1": ("x", [1, 2, 3]),
            "var2": ("x", [4, 5, 6]),
            "var3": ("x", [7, 8, 9]),
        },
        coords={"x": [0, 1, 2]},
    )

    result = _select_variables(ds, variables=None)
    assert set(result.data_vars) == set(ds.data_vars)

    result = _select_variables(ds, variables="var1")
    assert list(result.data_vars) == ["var1"]
    assert "var1" in result

    result = _select_variables(ds, variables=["var1", "var3"])
    assert set(result.data_vars) == {"var1", "var3"}
    assert "var2" not in result

    with pytest.raises(KeyError):
        _select_variables(ds, variables="nonexistent_var")


def test_get_grid_mapping_name():
    ds = Dataset({"var1": ("x", [1, 2, 3])}, coords={"x": [0, 1, 2]})
    assert _get_grid_mapping_name(ds) is None

    ds = Dataset({"var1": ("x", [1, 2, 3])})
    ds["var1"].attrs["grid_mapping"] = "crs_var"
    assert "crs_var" == _get_grid_mapping_name(ds)

    ds = Dataset({"var1": ("x", [1, 2, 3]), "crs": 0}, coords={"x": [0, 1, 2]})
    assert "crs" == _get_grid_mapping_name(ds)

    ds = Dataset({"var1": ("x", [1, 2, 3])}, coords={"x": [0, 1, 2], "spatial_ref": 0})
    assert "spatial_ref" == _get_grid_mapping_name(ds)

    ds = Dataset({"var1": ("x", [1, 2, 3])})
    ds["var1"].attrs["grid_mapping"] = "gm1"
    ds["crs"] = 0
    with pytest.raises(AssertionError):
        _get_grid_mapping_name(ds)


def test_get_interp_method(caplog):
    int_var = DataArray(np.array([1, 2, 3], dtype=np.int32), dims="x")
    float_var = DataArray(np.array([1.0, 2.0, 3.0], dtype=np.float32), dims="x")

    assert 0 == _get_interp_method(None, "var", int_var)
    assert 1 == _get_interp_method(None, "var", float_var)
    assert 1 == _get_interp_method(1, "var", float_var)
    assert "nearest" == _get_interp_method("nearest", "var", int_var)
    assert "bilinear" == _get_interp_method({"var": "bilinear"}, "var", float_var)
    assert "bilinear" == _get_interp_method(
        {np.dtype("float32"): "bilinear"}, "other", float_var
    )

    with caplog.at_level(logging.WARNING, logger="xcube.resampling"):
        result = _get_interp_method({"something": "bilinear"}, "var", int_var)
    assert 0 == result
    assert "Defaults are assigned" in caplog.text


def test_prep_interp_methods_downscale():
    assert _prep_interp_methods_downscale(None) is None
    assert "bilinear" == _prep_interp_methods_downscale("triangular")
    assert "nearest" == _prep_interp_methods_downscale("nearest")
    assert 1 == _prep_interp_methods_downscale(1)

    assert {"a": "bilinear", "b": "nearest"} == _prep_interp_methods_downscale(
        {"a": "triangular", "b": "nearest"}
    )
    interp_map = {"a": "nearest", "b": "bilinear"}
    assert interp_map == _prep_interp_methods_downscale(interp_map)


def test_get_agg_method(caplog):
    int_var = DataArray(np.array([1, 2, 3], dtype=np.int32), dims="x")
    float_var = DataArray(np.array([1.0, 2.0, 3.0], dtype=np.float32), dims="x")

    assert AGG_METHODS["center"] == _get_agg_method(None, "var", int_var)
    assert AGG_METHODS["mean"] == _get_agg_method(None, "var", float_var)
    assert AGG_METHODS["center"] == _get_agg_method("center", "var", float_var)
    assert AGG_METHODS["mean"] == _get_agg_method({"var": "mean"}, "var", int_var)
    assert AGG_METHODS["mean"] == _get_agg_method(
        {np.dtype("float32"): "mean"}, "other", float_var
    )

    with caplog.at_level(logging.WARNING, logger="xcube.resampling"):
        result = _get_agg_method({"something": "mean"}, "var", int_var)
    assert AGG_METHODS["center"] == result
    assert "Defaults are assigned" in caplog.text


def test_get_recover_nan(caplog):
    int_var = DataArray(np.array([1, 2, 3], dtype=np.int32), dims="x")
    float_var = DataArray(np.array([1.0, 2.0, 3.0], dtype=np.float32), dims="x")

    assert _get_recover_nan(True, "var", int_var) is True
    assert _get_recover_nan(False, "var", float_var) is False
    assert _get_recover_nan({"var": True}, "var", int_var) is True
    assert _get_recover_nan({np.dtype("float32"): True}, "other", float_var) is True

    with caplog.at_level(logging.WARNING, logger="xcube.resampling"):
        result = _get_recover_nan({"something": True}, "var", int_var)
    assert result is False
    assert "Defaults are assigned" in caplog.text

    assert _get_recover_nan(None, "var", float_var) is False


def test_get_fill_value(caplog):
    uint8_var = DataArray(np.array([1, 2, 3], dtype=np.uint8), dims="x")
    uint16_var = DataArray(np.array([1, 2, 3], dtype=np.uint16), dims="x")
    int_var = DataArray(np.array([1, 2, 3], dtype=np.int32), dims="x")
    float_var = DataArray(np.array([1.0, 2.0, 3.0], dtype=np.float32), dims="x")

    assert -99 == _get_fill_value(-99, "var", int_var)
    assert -9.9 == _get_fill_value(-9.9, "var", float_var)
    assert 1234 == _get_fill_value({"var": 1234}, "var", int_var)
    assert 3.14 == _get_fill_value({np.dtype("float32"): 3.14}, "other", float_var)

    with caplog.at_level(logging.WARNING, logger="xcube.resampling"):
        result = _get_fill_value({"something": 42}, "var", int_var)
    assert FILLVALUE_INT == result
    assert "Fill value could not be derived" in caplog.text

    assert FILLVALUE_UINT8 == _get_fill_value(None, "var", uint8_var)
    assert FILLVALUE_UINT16 == _get_fill_value(None, "var", uint16_var)
    assert FILLVALUE_INT == _get_fill_value(None, "var", int_var)
    assert np.isnan(_get_fill_value(None, "var", float_var))
