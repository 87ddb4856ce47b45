"""Bbox kernels (port of reference test_bboxes.py)."""

import numpy as np

from xcube_resampling_tpu.gridmapping.bboxes import compute_ij_bboxes, compute_xy_bbox


def _coord_images():
    lon = np.linspace(10.0, 20.0, 11)
    lat = np.linspace(50.0, 60.0, 11)
    return np.broadcast_to(lon[np.newaxis, :], (11, 11)).copy(), np.broadcast_to(
        lat[:, np.newaxis], (11, 11)
    ).copy()


def _run(xy_bboxes, xy_border=0.0, ij_border=0):
    lon_values, lat_values = _coord_images()
    ij_bboxes = np.full_like(np.asarray(xy_bboxes, dtype=float), -1, dtype=np.int64)
    compute_ij_bboxes(
        lon_values, lat_values, np.asarray(xy_bboxes, float), xy_border, ij_border,
        ij_bboxes,
    )
    return ij_bboxes


def test_all_included():
    np.testing.assert_almost_equal(
        _run([[10.0, 50.0, 20.0, 60.0]]), np.array([[0, 0, 11, 11]], dtype=np.int64)
    )


def test_tiles():
    a0, a1, a2 = 0.0, 5.0, 10.0
    xy_bboxes = [
        [10.0 + a0, 50.0 + a0, 10.0 + a1, 50.0 + a1],
        [10.0 + a1, 50.0 + a0, 10.0 + a2, 50.0 + a1],
        [10.0 + a0, 50.0 + a1, 10.0 + a1, 50.0 + a2],
        [10.0 + a1, 50.0 + a1, 10.0 + a2, 50.0 + a2],
    ]
    np.testing.assert_almost_equal(
        _run(xy_bboxes),
        np.array(
            [[0, 0, 6, 6], [5, 0, 11, 6], [0, 5, 6, 11], [5, 5, 11, 11]],
            dtype=np.int64,
        ),
    )


def test_none_found():
    a0, a1, a2 = 11.0, 16.0, 21.0
    xy_bboxes = [
        [10.0 + a0, 50.0 + a0, 10.0 + a1, 50.0 + a1],
        [10.0 + a1, 50.0 + a0, 10.0 + a2, 50.0 + a1],
        [10.0 + a0, 50.0 + a1, 10.0 + a1, 50.0 + a2],
        [10.0 + a1, 50.0 + a1, 10.0 + a2, 50.0 + a2],
    ]
    np.testing.assert_almost_equal(
        _run(xy_bboxes), np.full((4, 4), -1, dtype=np.int64)
    )


def test_with_border():
    bbox = [[12.4, 51.6, 12.6, 51.7]]
    np.testing.assert_almost_equal(
        _run(bbox, 0.0, 0), np.array([[-1, -1, -1, -1]], dtype=np.int64)
    )
    np.testing.assert_almost_equal(
        _run(bbox, 0.5, 0), np.array([[2, 2, 4, 3]], dtype=np.int64)
    )
    np.testing.assert_almost_equal(
        _run(bbox, 1.0, 0), np.array([[2, 1, 4, 3]], dtype=np.int64)
    )
    np.testing.assert_almost_equal(
        _run(bbox, 2.0, 0), np.array([[1, 0, 5, 4]], dtype=np.int64)
    )
    np.testing.assert_almost_equal(
        _run(bbox, 2.0, 2), np.array([[0, 0, 7, 6]], dtype=np.int64)
    )


DATA = [
    [
        [10, 11, 12, 13, 14],
        [11, 12, 13, 14, 15],
        [12, 13, 14, 15, 16],
        [13, 14, 15, 16, 17],
    ],
    [
        [50, 51, 52, 53, 54],
        [51, 52, 53, 54, 55],
        [52, 53, 54, 55, 56],
        [53, 54, 55, 56, 57],
    ],
]


def test_compute_xy_bbox():
    xy_coords = np.array(DATA, dtype=np.float64)
    assert (10, 50, 17, 57) == compute_xy_bbox(xy_coords)


def test_compute_xy_bbox_many_nans():
    w, h = 2000, 1000
    x = np.full(h * w, np.nan)
    y = np.full(h * w, np.nan)
    x[np.random.randint(0, w)] = 73.0
    y[np.random.randint(0, h)] = 34.0
    xy_coords = np.array([x.reshape((h, w)), y.reshape((h, w))], dtype=np.float64)
    assert (73.0, 34.0, 73.0, 34.0) == compute_xy_bbox(xy_coords)


def test_native_ij_bboxes_fuzz_matches_numpy():
    """The C++ row-culled bbox scan (native/bbox.cpp) must equal the
    vectorized numpy scan on random images, NaN patterns, borders and
    box layouts — including boxes with no hit (-1 rows)."""
    from xcube_resampling_tpu import native as nat
    from xcube_resampling_tpu.gridmapping.bboxes import compute_ij_bboxes

    if not nat.native_available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    for trial in range(20):
        h, w = int(rng.integers(2, 90)), int(rng.integers(2, 90))
        x = rng.random((h, w)) * 100
        y = rng.random((h, w)) * 80
        if trial % 3 == 0:
            x[rng.random((h, w)) < 0.1] = np.nan
            y[rng.random((h, w)) < 0.15] = np.nan
        n = int(rng.integers(1, 12))
        b = rng.random((n, 4)) * 110 - 5  # some boxes fully miss
        boxes = np.stack(
            [
                np.minimum(b[:, 0], b[:, 2]),
                np.minimum(b[:, 1], b[:, 3]),
                np.maximum(b[:, 0], b[:, 2]),
                np.maximum(b[:, 1], b[:, 3]),
            ],
            axis=1,
        )
        border = float(rng.random() * 5)
        ij_border = int(rng.integers(0, 3))
        out_nat = np.full((n, 4), -1, dtype=np.int64)
        out_ref = np.full((n, 4), -1, dtype=np.int64)
        nat.compute_ij_bboxes_native(x, y, boxes, border, ij_border, out_nat)
        real = nat.compute_ij_bboxes_native
        nat.compute_ij_bboxes_native = lambda *a: None
        try:
            compute_ij_bboxes(x, y, boxes, border, ij_border, out_ref)
        finally:
            nat.compute_ij_bboxes_native = real
        np.testing.assert_array_equal(out_nat, out_ref, err_msg=f"trial {trial}")
