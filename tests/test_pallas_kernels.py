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


def test_make_srw_fn_pallas_path_matches_xla(monkeypatch):
    """XRTPU_PALLAS=1 swaps the vertical pass for the Mosaic kernel;
    end-to-end output must match the XLA kernel (interpreter mode here;
    the same trace compiles for TPU)."""
    import jax.numpy as jnp

    from xcube_resampling_tpu.gridmapping import GridMapping
    from xcube_resampling_tpu.ops.srw import make_srw_fn, plan_srw

    source_gm = GridMapping.regular(
        size=(96, 96), xy_min=(565000.0, 5930000.0), xy_res=100.0,
        crs="epsg:32632",
    )
    target_gm = GridMapping.regular(
        size=(80, 80), xy_min=(4320500, 3379500), xy_res=100, crs="epsg:3035"
    )
    plan = plan_srw(source_gm, target_gm)
    assert plan is not None
    data = jnp.asarray(
        np.arange(96 * 96, dtype=np.float32).reshape(96, 96) / 96
    )

    ref = np.asarray(make_srw_fn(plan, "bilinear", np.nan)(data))

    monkeypatch.setenv("XRTPU_PALLAS", "1")
    monkeypatch.setenv("XRTPU_PALLAS_INTERPRET", "1")
    got = np.asarray(make_srw_fn(plan, "bilinear", np.nan)(data))
    np.testing.assert_allclose(got, ref, atol=1e-5, equal_nan=True)

    # band stacks fall back to the XLA kernel unchanged
    stack = jnp.stack([data, data * 2])
    got3 = np.asarray(make_srw_fn(plan, "bilinear", np.nan)(stack))
    assert got3.shape == (2, 80, 80)
    np.testing.assert_allclose(got3[0], ref, atol=1e-5, equal_nan=True)
    np.testing.assert_allclose(got3[1], ref * 2, atol=1e-4, equal_nan=True)
