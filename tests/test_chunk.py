"""Tile-decomposition utilities (the eager replacement for the reference's
custom dask-graph builder, reference dask.py:41-135)."""

import numpy as np

from xcube_resampling_tpu.chunk import (
    Tile,
    axis_tile_edges,
    compute_array_from_func,
    get_chunk_counts,
    get_chunk_sizes,
    iter_tiles,
)


def test_axis_tile_edges():
    np.testing.assert_array_equal(axis_tile_edges(13, 5), [0, 5, 10, 13])
    np.testing.assert_array_equal(axis_tile_edges(10, 5), [0, 5, 10])
    np.testing.assert_array_equal(axis_tile_edges(3, 5), [0, 3])


def test_get_chunk_sizes():
    assert [(5, 5, 3), (7, 6)] == list(get_chunk_sizes((13, 13), (5, 7)))
    assert [(13,)] == list(get_chunk_sizes((13,), (13,)))


def test_get_chunk_counts():
    assert [3, 2] == list(get_chunk_counts((13, 13), (5, 7)))


def test_iter_tiles_row_major_and_ragged():
    tiles = list(iter_tiles((5, 7), (3, 4)))
    assert [t.index for t in tiles] == [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert [t.shape for t in tiles] == [(3, 4), (3, 3), (2, 4), (2, 3)]
    assert tiles[3].slices == (slice(3, 5), slice(4, 7))
    assert tiles[3].bounds == ((3, 5), (4, 7))


def test_tile_record():
    t = Tile(index=(1,), slices=(slice(2, 9),))
    assert t.shape == (7,)
    assert t.bounds == ((2, 9),)


def test_iter_tiles_covers_exactly_once():
    hit = np.zeros((13, 13), dtype=np.int32)
    for tile in iter_tiles((13, 13), (5, 7)):
        hit[tile.slices] += 1
    np.testing.assert_array_equal(hit, 1)


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


def test_compute_array_from_func_whole_array_ctx():
    seen = {}

    def block_fn(shape, chunks, dtype, name, block_index):
        seen.setdefault("meta", (shape, chunks, dtype, name))
        return np.zeros((2, 3), dtype=dtype)

    compute_array_from_func(
        block_fn,
        shape=(2, 6),
        chunks=(2, 3),
        dtype=np.float32,
        name="probe",
        ctx_arg_names=["shape", "chunks", "dtype", "name", "block_index"],
    )
    assert seen["meta"] == ((2, 6), ((2,), (3, 3)), np.float32, "probe")
