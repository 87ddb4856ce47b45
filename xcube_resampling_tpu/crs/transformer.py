"""Coordinate transformer between two CRSs (pyproj.Transformer parity).

Unlike the reference, whose transforms are opaque C-library calls confined to
the host (reference: /root/reference/xcube_resampling/reproject.py:124-126,
472-496, rectify.py:196-213), a :class:`Transformer` here is a pure array
function pipeline — source inverse projection to the geographic (lon, lat)
hub, then target forward projection.  It runs on float64 numpy on the host
for golden-accurate index math, or traces into ``jax.jit`` for the fused
on-device reprojection kernel.
"""

from __future__ import annotations

import numpy as np

from .core import CRS


def _xp_of(x):
    mod = type(x).__module__
    if mod.startswith("jax") or "ArrayImpl" in type(x).__name__:
        import jax.numpy as jnp

        return jnp
    return np


class Transformer:
    """Transforms (x, y) coordinates from *src* CRS to *dst* CRS.

    Always operates in xy (easting/longitude first) order, matching the
    reference's universal use of ``always_xy=True``.
    """

    def __init__(self, src: CRS, dst: CRS):
        self.src = src
        self.dst = dst
        # plain (non-derived) geographic <-> geographic is an identity
        # (datums are treated as coincident, see crs.datum)
        self._identity = (
            src.proj_name is None and dst.proj_name is None
        ) or src == dst
        _, self._src_inv = src.projection()
        self._dst_fwd, _ = dst.projection()

    @classmethod
    def from_crs(cls, src, dst, always_xy: bool = True) -> "Transformer":
        return cls(CRS.from_user_input(src), CRS.from_user_input(dst))

    @property
    def is_identity(self) -> bool:
        return self._identity

    def transform(self, x, y, xp=None):
        """Transform arrays (or scalars) of x, y coordinates."""
        scalar = np.isscalar(x) or (hasattr(x, "ndim") and x.ndim == 0)
        if xp is None:
            xp = _xp_of(x) if hasattr(x, "dtype") else np
        if xp is np:
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
        if self._identity:
            out = x, y
        else:
            lon, lat = self._src_inv(x, y, xp)
            out = self._dst_fwd(lon, lat, xp)
        if scalar and xp is np:
            return float(out[0]), float(out[1])
        return out

    def transform_fn(self):
        """Return a pure ``(x, y, xp) -> (x2, y2)`` function for embedding in
        jitted device kernels."""
        if self._identity:
            return lambda x, y, xp: (x, y)
        src_inv, dst_fwd = self._src_inv, self._dst_fwd

        def fn(x, y, xp):
            lon, lat = src_inv(x, y, xp)
            return dst_fwd(lon, lat, xp)

        return fn

    def transform_bounds(
        self,
        left: float,
        bottom: float,
        right: float,
        top: float,
        densify_pts: int = 21,
    ) -> tuple[float, float, float, float]:
        """Transform a bounding box by densifying its edges
        (pyproj.Transformer.transform_bounds parity; used at reference
        reproject.py:347, 398 and transform.py:91)."""
        n = max(2, int(densify_pts))
        xs = np.linspace(left, right, n)
        ys = np.linspace(bottom, top, n)
        edge_x = np.concatenate(
            [xs, xs, np.full(n, left), np.full(n, right)]
        )
        edge_y = np.concatenate(
            [np.full(n, bottom), np.full(n, top), ys, ys]
        )
        tx, ty = self.transform(edge_x, edge_y)
        tx = np.asarray(tx, dtype=np.float64)
        ty = np.asarray(ty, dtype=np.float64)
        return (
            float(np.nanmin(tx)),
            float(np.nanmin(ty)),
            float(np.nanmax(tx)),
            float(np.nanmax(ty)),
        )
