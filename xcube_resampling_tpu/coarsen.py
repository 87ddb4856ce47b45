"""Window reducer functions for coarsening (downsampling aggregation).

Numpy implementations with the exact semantics of the reference's
coarsen.py reducers (/root/reference/xcube_resampling/coarsen.py:50-155):
NaN-aware statistics for float dtypes, rounded int round-trips for integer
dtypes, positional first/last/center, and categorical mode.  The reference's
numba histogram kernel (coarsen.py:138-155) is replaced by a vectorized
offset-bincount; the on-device equivalents (XLA reduce-window style reshape
reductions) live in :mod:`xcube_resampling_tpu.ops.coarsen_ops`.

A reducer is called with a window-expanded block of shape e.g.
``(reduced_height, window_y, reduced_width, window_x)`` and the tuple of
window axes, and returns the reduced array.  ``axis=None`` means an edge
pass-through block.
"""

from __future__ import annotations

import warnings

import numpy as np

_ALL = slice(None)

_DOC = """Computes the {property} of the windows in `block`.

Args:
    block: Array block reshaped into windows to be reduced to size one.
        For spatial images, its shape will be
        `(reduced_height, window_size_y, reduced_width, window_size_x)`.
    axis: A tuple providing the indexes of the window dimensions in the
        shape of `block`. For spatial images, this will be `(1, 3)`.

Returns:
    The reduced array containing the {property} of the windows from
    `block`. For spatial images, its shape will be
    `(reduced_height, reduced_width)`.
"""


def first(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    if axis is None:
        return block  # edge block, pass through
    index = tuple(0 if i in axis else _ALL for i in range(block.ndim))
    return block[index]


def last(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    if axis is None:
        return block  # edge block, pass through
    index = tuple(-1 if i in axis else _ALL for i in range(block.ndim))
    return block[index]


def center(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    if axis is None:
        return block  # edge block, pass through
    shape = block.shape
    index = tuple(shape[i] // 2 if i in axis else _ALL for i in range(block.ndim))
    return block[index]


def mean(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    return _reduce(np.mean, np.nanmean, block, axis)


def median(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    return _reduce(np.median, np.nanmedian, block, axis)


def std(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    return _reduce(np.std, np.nanstd, block, axis)


# noinspection PyShadowingBuiltins
def sum(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    return _reduce(np.sum, np.nansum, block, axis)


def var(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    return _reduce(np.var, np.nanvar, block, axis)


def _reduce(
    reducer, nan_reducer, block: np.ndarray, axis: tuple[int, ...] | None = None
) -> np.ndarray:
    if axis is None:
        # edge block, pass through
        return block
    elif np.issubdtype(block.dtype, np.floating):
        # Use the NaN-aware reducer for floating point types
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return nan_reducer(block, axis)
    else:
        # Plain reducer for integer and boolean types;
        # if the result became floating point, round and cast back
        a = reducer(block, axis)
        if np.issubdtype(a.dtype, np.floating):
            return np.rint(a).astype(block.dtype)
        return a


def mode(block: np.ndarray, axis: tuple[int, ...] | None = None) -> np.ndarray:
    """Most frequent value per window.  Assumes categorical (integer-valued)
    data; ties resolve to the smallest value, matching the reference's
    histogram scan (reference coarsen.py:138-155)."""
    if axis is None:
        return block  # edge block, pass through

    ndim = len(axis)
    block = np.moveaxis(block, axis, range(-ndim, 0))
    flat = block.reshape(-1, int(np.prod(block.shape[-ndim:])))

    min_val = int(flat.min())
    max_val = int(flat.max())
    mode_range = max_val - min_val + 1

    normalized = (flat - min_val).astype(np.int64)
    # vectorized per-row histogram: offset each row into its own bin range,
    # one global bincount, then argmax per row (argmax -> first max -> the
    # smallest value wins ties, same as the sequential histogram scan)
    n_rows = normalized.shape[0]
    row_offsets = (np.arange(n_rows, dtype=np.int64) * mode_range)[:, np.newaxis]
    counts = np.bincount(
        (normalized + row_offsets).ravel(), minlength=n_rows * mode_range
    ).reshape(n_rows, mode_range)
    mode_indices = counts.argmax(axis=1) + min_val
    return mode_indices.reshape(block.shape[:-ndim])


first.__doc__ = _DOC.format(property="first value")
last.__doc__ = _DOC.format(property="last value")
center.__doc__ = _DOC.format(property="center value")
mean.__doc__ = _DOC.format(property="mean")
median.__doc__ = _DOC.format(property="median")
mode.__doc__ = (mode.__doc__ or "") + "\n\n" + _DOC.format(property="mode")
std.__doc__ = _DOC.format(property="standard deviation")
sum.__doc__ = _DOC.format(property="sum")
var.__doc__ = _DOC.format(property="variance")
