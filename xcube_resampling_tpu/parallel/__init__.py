"""Multi-chip execution: device meshes, tile sharding, halo exchange.

This is the rebuild's replacement for the reference's dask chunk scheduler
(reference dask.py + `.compute()` call sites): chunked execution becomes
static-shape tile batches sharded over a ``jax.sharding.Mesh`` — one xarray
chunk maps to one device tile; interpolation stencils at tile borders are
fed by genuine halo exchange (``lax.ppermute``) instead of the reference's
redundant enlarged-window gathering (reproject.py:405-423).
"""

from .mesh import make_mesh
from .tiling import TileBatch, batch_tiles, untile
from .halo import (
    make_sharded_esw_step,
    make_sharded_rectify_step,
    make_sharded_regrid_step,
    make_sharded_srw_step,
    sharded_phase_a,
    sharded_rectify,
    sharded_reproject,
)

__all__ = [
    "TileBatch",
    "batch_tiles",
    "make_mesh",
    "make_sharded_esw_step",
    "make_sharded_rectify_step",
    "make_sharded_regrid_step",
    "make_sharded_srw_step",
    "sharded_phase_a",
    "sharded_rectify",
    "sharded_reproject",
    "untile",
]
