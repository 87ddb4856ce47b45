"""Chunk/tile orchestration utilities — the dask-graph replacement.

The reference builds custom dask graphs block-by-block
(reference: /root/reference/xcube_resampling/dask.py:41-135).  On TPU there
is no task scheduler: tiles are *static shapes*.  This module supplies the
same tiling math (chunk sizes, block iterators, nested block assembly) but
executes eagerly — the caller's block function runs per tile (typically a
jit-compiled kernel over a batch of tiles, see
:mod:`xcube_resampling_tpu.parallel.tiling`).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable, Mapping, Sequence
from typing import Any

import numpy as np

IntTuple = tuple[int, ...]
SliceTuple = tuple[slice, ...]
IntTupleIterable = Iterable[IntTuple]
SliceTupleIterable = Iterable[SliceTuple]


def get_chunk_sizes(shape: IntTuple, chunks: IntTuple) -> IntTupleIterable:
    """Dask-style explicit chunk sizes per dimension:
    shape 13 chunked by 5 -> (5, 5, 3)."""
    for s, c in zip(shape, chunks):
        n = s // c
        if n * c < s:
            yield (c,) * n + (s % c,)
        else:
            yield (c,) * n


def get_chunk_counts(shape: IntTuple, chunks: IntTuple) -> Iterable[int]:
    for s, c in zip(shape, chunks):
        yield (s + c - 1) // c


def get_chunk_slice_tuples(chunk_size_tuples: IntTupleIterable) -> SliceTupleIterable:
    return (
        tuple(get_chunk_slices(chunk_size_tuple))
        for chunk_size_tuple in chunk_size_tuples
    )


def get_chunk_slices(chunk_sizes: Sequence[int]) -> Iterable[slice]:
    stop = 0
    for size in chunk_sizes:
        start = stop
        stop = start + size
        yield slice(start, stop)


def get_chunk_ranges(chunk_size_tuples: IntTupleIterable) -> Iterable[range]:
    return (range(len(chunk_size_tuple)) for chunk_size_tuple in chunk_size_tuples)


def get_block_iterators(
    chunk_sizes: IntTupleIterable,
) -> tuple[IntTupleIterable, IntTupleIterable, SliceTupleIterable]:
    chunk_sizes = tuple(chunk_sizes)
    chunk_slices_tuples = get_chunk_slice_tuples(chunk_sizes)
    chunk_ranges = get_chunk_ranges(chunk_sizes)
    block_indexes = itertools.product(*chunk_ranges)
    block_shapes = itertools.product(*chunk_sizes)
    block_slices = itertools.product(*chunk_slices_tuples)
    return block_indexes, block_shapes, block_slices


def compute_array_from_func(
    func: Callable[..., np.ndarray],
    shape: IntTuple,
    chunks: IntTuple,
    dtype: Any,
    name: str = None,
    ctx_arg_names: Sequence[str] = None,
    args: Sequence[Any] = None,
    kwargs: Mapping[str, Any] = None,
) -> np.ndarray:
    """Assemble an array by invoking *func* once per tile with injected block
    context (eager analogue of reference dask.py:41-135).

    The block function may request context arguments by name:
    ``shape``, ``chunks``, ``dtype``, ``name``, ``block_id``, ``block_index``,
    ``block_shape``, ``block_slices``.
    """
    ctx_arg_names = ctx_arg_names or []
    args = args or []
    kwargs = kwargs or {}

    chunk_sizes = tuple(get_chunk_sizes(shape, chunks))
    block_indexes, block_shapes, block_slices_it = get_block_iterators(chunk_sizes)

    ctx_values = dict(
        shape=tuple(shape),
        chunks=chunk_sizes,
        dtype=dtype,
        name=name,
    )

    out = np.empty(shape, dtype=dtype)
    block_id = 0
    for chunk_index, chunk_shape, block_slices in zip(
        block_indexes, block_shapes, block_slices_it
    ):
        ctx_values.update(
            block_id=block_id,
            block_index=tuple(chunk_index),
            block_shape=tuple(chunk_shape),
            block_slices=tuple(
                (chunk_slice.start, chunk_slice.stop) for chunk_slice in block_slices
            ),
        )
        ctx_args = [ctx_values[ctx_arg_name] for ctx_arg_name in ctx_arg_names]
        block = func(*ctx_args, *args, **kwargs)
        out[block_slices] = np.asarray(block)
        block_id += 1

    return out


class NestedList:
    """N-dimensional nested list for assembling tiled results
    (reference dask.py:183-232 `_NestedList` parity)."""

    def __init__(self, shape: Sequence[int], fill_value: Any = None):
        self._shape = tuple(shape)
        self._data = self._new_data(shape, len(shape), fill_value, 0)

    @classmethod
    def _new_data(
        cls, shape: Sequence[int], ndim: int, fill_value: Any, dim: int
    ) -> list:
        return [
            (
                cls._new_data(shape, ndim, fill_value, dim + 1)
                if dim < ndim - 1
                else fill_value
            )
            for _ in range(shape[dim])
        ]

    @property
    def shape(self) -> tuple[int, ...]:
        return self._shape

    @property
    def data(self) -> list:
        return self._data

    def __len__(self) -> int:
        return len(self._data)

    def __setitem__(self, index, value):
        data = self._data
        if isinstance(index, tuple):
            for i in index[:-1]:
                data = data[i]
            data[index[-1]] = value
        else:
            data[index] = value

    def __getitem__(self, index):
        data = self._data
        if isinstance(index, tuple):
            for i in index[:-1]:
                data = data[i]
            return data[index[-1]]
        return data[index]


# Backwards-compatible alias matching the reference's private name
_NestedList = NestedList
