"""Shared bootstrap for the example scripts.

Importing this module makes the examples runnable from the repo root
(``python examples/<name>.py``) and honours ``JAX_PLATFORMS`` through the
config API — the axon TPU plugin ignores the env var, so CPU-only runs
(``JAX_PLATFORMS=cpu``) would otherwise still grab the TPU lease.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
