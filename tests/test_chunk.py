"""Chunk orchestration utilities (port of reference tests/test_dask.py plus
coverage for the eager tiled array assembly)."""

import numpy as np
import pytest

from xcube_resampling_tpu.chunk import (
    NestedList,
    compute_array_from_func,
    get_chunk_counts,
    get_chunk_sizes,
)


class TestNestedList:
    def test_1d(self):
        nl = NestedList(shape=(3,))
        assert (3,) == nl.shape
        assert 3 == len(nl)
        nl[0] = "a"
        nl[1] = "b"
        nl[2] = "c"
        assert "b" == nl[1]
        assert ["a", "b", "c"] == nl.data

    def test_2d(self):
        nl = NestedList(shape=(2, 3), fill_value=0)
        assert (2, 3) == nl.shape
        assert 2 == len(nl)
        nl[0, 0] = 10
        nl[1, 2] = 20
        assert 10 == nl[0, 0]
        assert 20 == nl[1, 2]
        assert [[10, 0, 0], [0, 0, 20]] == nl.data
        nl[1] = [7, 8, 9]
        assert [7, 8, 9] == nl[1]

    def test_3d(self):
        nl = NestedList(shape=(2, 2, 2))
        nl[1, 1, 1] = 42
        assert 42 == nl[1, 1, 1]


def test_get_chunk_sizes():
    assert [(5, 5, 3), (7, 6)] == list(get_chunk_sizes((13, 13), (5, 7)))
    assert [(13,)] == list(get_chunk_sizes((13,), (13,)))


def test_get_chunk_counts():
    assert [3, 2] == list(get_chunk_counts((13, 13), (5, 7)))


def test_compute_array_from_func():
    def block_fn(block_id, block_shape, block_slices, factor):
        out = np.full(block_shape, block_id, dtype=np.int32)
        return out * factor

    arr = compute_array_from_func(
        block_fn,
        shape=(4, 6),
        chunks=(2, 3),
        dtype=np.int32,
        ctx_arg_names=["block_id", "block_shape", "block_slices"],
        args=(10,),
    )
    assert arr.shape == (4, 6)
    np.testing.assert_array_equal(arr[:2, :3], np.full((2, 3), 0))
    np.testing.assert_array_equal(arr[:2, 3:], np.full((2, 3), 10))
    np.testing.assert_array_equal(arr[2:, :3], np.full((2, 3), 20))
    np.testing.assert_array_equal(arr[2:, 3:], np.full((2, 3), 30))
