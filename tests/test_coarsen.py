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


def test_mode_pairwise_and_sort_paths_match_host():
    """The device mode's pairwise small-window path and its sort-based
    large-window fallback (ops/coarsen_ops.py::_mode_jax) must both match
    the host histogram reducer, including tie-to-smallest."""
    import jax.numpy as jnp

    from xcube_resampling_tpu.constants import AGG_METHODS
    from xcube_resampling_tpu.ops import coarsen_ops

    rng = np.random.default_rng(5)
    for trial in range(5):
        for dt in (np.int32, np.float64):
            a = rng.integers(0, 6, (8, 12)).astype(dt)
            dev = np.asarray(coarsen_ops.coarsen_jax(jnp.asarray(a), 4, 4, "mode"))
            host = coarsen_ops.coarsen_numpy(a, 4, 4, AGG_METHODS["mode"])
            np.testing.assert_array_equal(dev, host)
        # 9x9 = 81 taps > _MODE_PAIRWISE_MAX_W: the sort fallback
        b = rng.integers(0, 9, (18, 18)).astype(np.int32)
        dev = np.asarray(coarsen_ops.coarsen_jax(jnp.asarray(b), 9, 9, "mode"))
        host = coarsen_ops.coarsen_numpy(b, 9, 9, AGG_METHODS["mode"])
        np.testing.assert_array_equal(dev, host)
