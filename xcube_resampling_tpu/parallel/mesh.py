"""Device mesh helpers."""

from __future__ import annotations


def make_mesh(axis_names=("tiles",), shape=None, devices=None):
    """Create a ``jax.sharding.Mesh`` over the available devices.

    Args:
        axis_names: Mesh axis names; default a single tile axis.
        shape: Optional mesh shape; defaults to all devices on one axis.
        devices: Optional explicit device list.
    """
    import jax
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return jax.sharding.Mesh(dev_array, axis_names)
