"""Pallas kernel correctness (interpreter mode on CPU; the same kernels
compile for TPU via Mosaic)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from xcube_resampling_tpu.ops.pallas_kernels import (
    srw_vertical_pallas,
    srw_vertical_reference,
)

rng = np.random.default_rng(7)


@pytest.mark.parametrize("d_taps", [2, 5, 9])
def test_srw_vertical_pallas_matches_reference(d_taps):
    src = rng.random((120, 256)).astype(np.float32)
    out_h = 100
    base = np.linspace(-2, 118, out_h).astype(np.int32)
    pos = base[:, None].astype(np.float32) + rng.random(
        (out_h, 256), np.float32
    ) * (d_taps - 2 if d_taps > 2 else 1)
    ref = srw_vertical_reference(src, pos, base, d_taps)
    got = np.asarray(
        srw_vertical_pallas(src, pos, base, d_taps, row_block=32, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_srw_vertical_pallas_ragged_rows():
    """out_h not divisible by row_block."""
    src = rng.random((64, 128)).astype(np.float32)
    out_h = 50
    base = np.linspace(0, 60, out_h).astype(np.int32)
    pos = base[:, None] + rng.random((out_h, 128), np.float32)
    ref = srw_vertical_reference(src, pos, base, 3)
    got = np.asarray(
        srw_vertical_pallas(src, pos, base, 3, row_block=16, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
