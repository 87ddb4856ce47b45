"""Native C++ host kernels: availability and parity with the numpy
semantics-reference implementation."""

import os

import numpy as np
import pytest

from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.native import inverse_ij_map_native, native_available
from xcube_resampling_tpu.ops import rectify_ops


def _swath(h, w, seed=0):
    r = np.random.default_rng(seed)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lon = 1.0 * ii - 0.4 * jj + 0.05 * r.random((h, w))
    lat = 56.0 - 1.0 * jj - 0.2 * ii + 0.05 * r.random((h, w))
    return lon.astype(np.float64), lat.astype(np.float64)


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)


def _numpy_reference(*args):
    """Run the vectorized numpy Phase A with the native path disabled."""
    os.environ["XRTPU_NO_NATIVE"] = "1"
    try:
        import xcube_resampling_tpu.native as nat

        lib, tried = nat._lib, nat._tried
        nat._lib, nat._tried = None, True
        try:
            return rectify_ops.inverse_ij_map(*args)
        finally:
            nat._lib, nat._tried = lib, tried
    finally:
        os.environ.pop("XRTPU_NO_NATIVE", None)


def test_native_phase_a_parity_random_swath():
    src_x, src_y = _swath(7, 9)
    args = (src_x, src_y, 3, 5, (25, 30), -4.0, 57.0, 0.5, -0.5, UV_DELTA)
    ref = _numpy_reference(*args)
    nat = inverse_ij_map_native(*args)
    np.testing.assert_array_equal(nat, ref)


def test_native_phase_a_parity_2x2():
    lon = np.array([[1.0, 6.0], [0.0, 2.0]])
    lat = np.array([[56.0, 53.0], [52.0, 50.0]])
    args = (lon, lat, 0, 0, (13, 13), -0.25, 56.25, 0.5, -0.5, UV_DELTA)
    ref = _numpy_reference(*args)
    nat = inverse_ij_map_native(*args)
    np.testing.assert_array_equal(nat, ref)


def test_native_phase_a_handles_nans():
    src_x, src_y = _swath(6, 6)
    src_x[2, 3] = np.nan
    src_y[4, 1] = np.nan
    args = (src_x, src_y, 0, 0, (20, 20), -2.0, 57.0, 0.5, -0.5, UV_DELTA)
    ref = _numpy_reference(*args)
    nat = inverse_ij_map_native(*args)
    np.testing.assert_array_equal(nat, ref)
