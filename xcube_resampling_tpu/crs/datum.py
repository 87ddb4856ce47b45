"""Reference ellipsoids / datums for the TPU-native CRS engine.

The reference library delegates all geodesy to the PROJ C library via pyproj
(reference: /root/reference/xcube_resampling/gridmapping/base.py:49-52,
reproject.py:124-126).  This rebuild implements the projection math natively
so coordinate transforms are pure array functions that run under ``jax.jit``
on TPU — the transform step becomes part of the fused device kernel instead
of a host-side staging pass.

Datum note: ETRS89 and WGS84 are treated as coincident (their offset is
< 1 m and drifting; PROJ's default ballpark transformation does the same),
so the geographic hub of a transform pipeline is a shared (lon, lat).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Ellipsoid:
    name: str
    a: float  # semi-major axis [m]
    inverse_flattening: float  # 1/f, 0 => sphere

    @property
    def f(self) -> float:
        return 1.0 / self.inverse_flattening if self.inverse_flattening else 0.0

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        f = self.f
        return f * (2.0 - f)

    @property
    def e(self) -> float:
        return self.e2**0.5

    @property
    def n(self) -> float:
        """Third flattening."""
        f = self.f
        return f / (2.0 - f)


WGS84 = Ellipsoid("WGS 84", 6378137.0, 298.257223563)
GRS80 = Ellipsoid("GRS 1980", 6378137.0, 298.257222101)
SPHERE = Ellipsoid("Normal Sphere", 6370997.0, 0.0)

ELLIPSOIDS = {e.name: e for e in (WGS84, GRS80, SPHERE)}


def ellipsoid_from_params(
    semi_major_axis: float | None = None,
    inverse_flattening: float | None = None,
    semi_minor_axis: float | None = None,
    reference_ellipsoid_name: str | None = None,
) -> Ellipsoid:
    """Build an ellipsoid from CF grid-mapping attributes."""
    if reference_ellipsoid_name and reference_ellipsoid_name in ELLIPSOIDS:
        return ELLIPSOIDS[reference_ellipsoid_name]
    if semi_major_axis is None:
        return WGS84
    a = float(semi_major_axis)
    if inverse_flattening is not None:
        rf = float(inverse_flattening)
    elif semi_minor_axis is not None and semi_minor_axis != a:
        rf = a / (a - float(semi_minor_axis))
    else:
        rf = 0.0
    for known in (WGS84, GRS80):
        if abs(known.a - a) < 1e-6 and abs(known.inverse_flattening - rf) < 1e-6:
            return known
    return Ellipsoid("unnamed", a, rf)
