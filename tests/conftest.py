"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware, and with x64 enabled so host-side golden
index math stays in float64 (the analogue of the reference disabling numba
JIT under test, /root/reference/tests/conftest.py:1-3 — kernels run in their
debuggable/interpretable form, goldens are defined by float64 semantics).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

# The axon TPU plugin does not honour JAX_PLATFORMS, so force the platform
# and virtual device count through the config API before any backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_reproject_plan_cache():
    """The device-reproject plan memo is keyed on geometry + env flags;
    tests that monkeypatch tier builders must never see another test's
    cached tier function."""
    yield
    from xcube_resampling_tpu import reproject

    reproject._DEVICE_FN_CACHE.clear()
