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
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
