"""Optional xarray interop: convert between ``xarray.Dataset`` and
:class:`xcube_resampling_tpu.xrlite.Dataset`.

The reference framework's currency is ``xarray.Dataset``
(reference: /root/reference/xcube_resampling/spatial.py:41); this rebuild's
is :mod:`xrlite`.  The two models are mechanically equivalent
(dims + coords + attrs + array data), so users arriving with
reference-shaped data convert at the boundary:

    import xarray as xr
    from xcube_resampling_tpu import interop, resample_in_space

    ds = interop.from_xarray(xr.open_zarr(path))
    out = resample_in_space(ds, target_gm=gm)
    xr_out = interop.to_xarray(out)

This module never imports jax and imports xarray lazily, so it is safe to
import in any environment; the conversion functions raise ImportError with
a clear message when xarray is absent.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import numpy as np

from . import xrlite

if TYPE_CHECKING:  # pragma: no cover
    import xarray


def _require_xarray():
    try:
        import xarray
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "xarray is required for interop conversions; install xarray or "
            "construct xcube_resampling_tpu.xrlite.Dataset objects directly"
        ) from e
    return xarray


def _chunks_mapping(var: Any) -> dict[str, int] | None:
    """Per-dimension chunk sizes from an xarray variable, if chunked."""
    chunks = getattr(var, "chunks", None)
    if not chunks:
        return None
    # xarray reports a tuple of block-size tuples per dim; xrlite carries a
    # single size per dim (the tile size), so take the leading block size.
    return {dim: sizes[0] for dim, sizes in zip(var.dims, chunks)}


def from_xarray(ds: "xarray.Dataset") -> xrlite.Dataset:
    """Convert an ``xarray.Dataset`` to an :class:`xrlite.Dataset`.

    Data is materialized (dask-backed variables are computed); dims, coords,
    per-variable attrs, and dataset attrs carry over; dask chunk layouts are
    preserved as xrlite chunk metadata for the tiled executor.
    """
    _require_xarray()
    out = xrlite.Dataset(attrs=dict(ds.attrs))
    for name, coord in ds.coords.items():
        out._coords[str(name)] = xrlite.DataArray(
            np.asarray(coord.values),
            dims=tuple(str(d) for d in coord.dims),
            attrs=dict(coord.attrs),
            name=str(name),
        )
    for name, var in ds.data_vars.items():
        out._data_vars[str(name)] = xrlite.DataArray(
            np.asarray(var.values),
            dims=tuple(str(d) for d in var.dims),
            attrs=dict(var.attrs),
            name=str(name),
            chunks=_chunks_mapping(var),
        )
    return out


def to_xarray(ds: xrlite.Dataset) -> "xarray.Dataset":
    """Convert an :class:`xrlite.Dataset` to an ``xarray.Dataset``.

    JAX-backed variables are pulled to host numpy.  Chunk metadata is not
    re-applied (the result is an eager in-memory xarray Dataset; call
    ``.chunk(...)`` on it to restore a dask layout).
    """
    xarray = _require_xarray()
    coords = {
        name: xarray.DataArray(
            np.asarray(c.data), dims=c.dims, attrs=dict(c.attrs), name=name
        )
        for name, c in ds.coords.items()
    }
    data_vars = {
        name: xarray.DataArray(
            np.asarray(v.data), dims=v.dims, attrs=dict(v.attrs), name=name
        )
        for name, v in ds.data_vars.items()
    }
    return xarray.Dataset(data_vars=data_vars, coords=coords, attrs=dict(ds.attrs))
