"""Coarsen reducer behaviour (port of reference tests/test_coarsen.py)."""

import numpy as np

from xcube_resampling_tpu import coarsen


def test_all_reducers():
    arr_float = np.array([[1.0, 2.0], [3.0, 4.0]])
    arr_int = np.array([[1, 2], [3, 4]])
    arr_mode = np.array([[1, 2, 2], [3, 2, 2]])

    axis = (0, 1)

    np.testing.assert_array_equal(coarsen.first(arr_float, axis), np.array(1.0))
    np.testing.assert_array_equal(coarsen.last(arr_float, axis), np.array(4.0))
    np.testing.assert_array_equal(coarsen.center(arr_float, axis), np.array(4.0))
    np.testing.assert_array_equal(coarsen.mean(arr_float, axis), np.array(2.5))
    np.testing.assert_array_equal(coarsen.mean(arr_int, axis), np.array(2))
    np.testing.assert_array_equal(coarsen.median(arr_float, axis), np.array(2.5))
    np.testing.assert_array_almost_equal(
        coarsen.std(arr_float, axis), np.array(np.std(arr_float))
    )
    np.testing.assert_array_equal(coarsen.sum(arr_int, axis), np.array(10))
    np.testing.assert_array_almost_equal(
        coarsen.var(arr_float, axis), np.array(np.var(arr_float))
    )
    np.testing.assert_array_equal(coarsen.mode(arr_mode, axis), np.array(2))

    # axis=None edge block pass-through
    for reducer in [coarsen.first, coarsen.last, coarsen.center, coarsen.mode]:
        np.testing.assert_array_equal(reducer(arr_float, axis=None), arr_float)


def test_mode_ties_resolve_to_smallest():
    arr = np.array([[1, 2], [2, 1]])
    np.testing.assert_array_equal(coarsen.mode(arr, (0, 1)), np.array(1))


def test_nan_awareness():
    arr = np.array([[1.0, np.nan], [3.0, 5.0]])
    np.testing.assert_array_equal(coarsen.mean(arr, (0, 1)), np.array(3.0))
    np.testing.assert_array_equal(coarsen.sum(arr, (0, 1)), np.array(9.0))
