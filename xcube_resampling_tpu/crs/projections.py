"""Map-projection forward/inverse formulas as dtype-generic array functions.

Every projection is exposed as ``make_<name>(params, ellipsoid)`` returning a
``(forward, inverse)`` pair of closures::

    x, y = forward(lon_deg, lat_deg, xp)   # xp is numpy or jax.numpy
    lon, lat = inverse(x, y, xp)

All derived constants (series coefficients, origin offsets) are precomputed
as Python floats at construction time, so the closures trace cleanly under
``jax.jit`` with static geometry and run on TPU as fused element-wise code
(VPU), or in float64 numpy on the host for golden-accurate index math.

Formulas follow Karney (2011) for the transverse Mercator (6th-order Krüger
series, sub-nanometer accuracy) and Snyder (1987) / the EPSG guidance notes
for the others.  This module replaces the reference's dependency on the PROJ
C library (reference: /root/reference/xcube_resampling/reproject.py:124-126,
rectify.py:196-198 use pyproj.Transformer).
"""

from __future__ import annotations

import math

from .datum import Ellipsoid

__all__ = ["make_projection", "PROJECTION_FACTORIES"]


def _d2r(xp, deg):
    return deg * (math.pi / 180.0)


def _r2d(xp, rad):
    return rad * (180.0 / math.pi)


def _authalic_to_geodetic(beta, e2: float, xp):
    """Geodetic latitude from authalic latitude via the standard series
    (Snyder 3-18): three sine terms, ~1e-10 rad for earth ellipsoids —
    replaces per-element Newton iterations whose log/sin per step made
    host inverse transforms ~4x the forward cost."""
    if e2 == 0:
        return beta
    e4 = e2 * e2
    e6 = e4 * e2
    c2 = e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0
    c4 = 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0
    c6 = 761.0 * e6 / 45360.0
    return (
        beta
        + c2 * xp.sin(2.0 * beta)
        + c4 * xp.sin(4.0 * beta)
        + c6 * xp.sin(6.0 * beta)
    )


def _conformal_to_geodetic(chi, e2: float, xp):
    """Geodetic latitude from conformal latitude via the standard series
    (Snyder 3-5), ~1e-10 rad for earth ellipsoids."""
    if e2 == 0:
        return chi
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e6 * e2
    c2 = e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0
    c4 = 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0
    c6 = 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0
    c8 = 4279.0 * e8 / 161280.0
    return (
        chi
        + c2 * xp.sin(2.0 * chi)
        + c4 * xp.sin(4.0 * chi)
        + c6 * xp.sin(6.0 * chi)
        + c8 * xp.sin(8.0 * chi)
    )


# ---------------------------------------------------------------------------
# Transverse Mercator (Karney / Krüger series)
# ---------------------------------------------------------------------------


def _tm_alpha_beta(n: float) -> tuple[list[float], list[float]]:
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    alpha = [
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ]
    return alpha, beta


def make_transverse_mercator(params: dict, ell: Ellipsoid):
    k0 = float(params.get("scale_factor_at_central_meridian", 1.0))
    lon0 = float(
        params.get(
            "longitude_of_central_meridian",
            params.get("longitude_of_projection_origin", 0.0),
        )
    )
    lat0 = float(params.get("latitude_of_projection_origin", 0.0))
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, f = ell.a, ell.f
    e = ell.e
    n = ell.n
    big_a = a / (1 + n) * (1 + n * n / 4 + n**4 / 64 + n**6 / 256)
    alpha, beta = _tm_alpha_beta(n)
    lon0_rad = math.radians(lon0)

    def _xi_eta(lon_rad, lat_rad, xp):
        sphi = xp.sin(lat_rad)
        if e > 0:
            t = xp.sinh(
                xp.arcsinh(xp.tan(lat_rad)) - e * xp.arctanh(e * sphi)
            )
        else:
            t = xp.tan(lat_rad)
        dlam = lon_rad - lon0_rad
        # wrap to [-pi, pi]
        dlam = (dlam + math.pi) % (2 * math.pi) - math.pi
        cos_l = xp.cos(dlam)
        xi_p = xp.arctan2(t, cos_l)
        eta_p = xp.arcsinh(xp.sin(dlam) / xp.sqrt(t * t + cos_l * cos_l))
        xi = xi_p
        eta = eta_p
        for j, aj in enumerate(alpha, start=1):
            xi = xi + aj * xp.sin(2 * j * xi_p) * xp.cosh(2 * j * eta_p)
            eta = eta + aj * xp.cos(2 * j * xi_p) * xp.sinh(2 * j * eta_p)
        return xi, eta

    # northing offset so that lat0 maps to northing fn
    if lat0 != 0.0:
        import numpy as _np

        xi0, _ = _xi_eta(_np.array(lon0_rad), _np.array(math.radians(lat0)), _np)
        m0 = k0 * big_a * float(xi0)
    else:
        m0 = 0.0

    def forward(lon, lat, xp):
        lon_rad = _d2r(xp, lon)
        lat_rad = _d2r(xp, lat)
        xi, eta = _xi_eta(lon_rad, lat_rad, xp)
        x = fe + k0 * big_a * eta
        y = fn - m0 + k0 * big_a * xi
        return x, y

    def inverse(x, y, xp):
        eta = (x - fe) / (k0 * big_a)
        xi = (y - fn + m0) / (k0 * big_a)
        xi_p = xi
        eta_p = eta
        for j, bj in enumerate(beta, start=1):
            xi_p = xi_p - bj * xp.sin(2 * j * xi) * xp.cosh(2 * j * eta)
            eta_p = eta_p - bj * xp.cos(2 * j * xi) * xp.sinh(2 * j * eta)
        sinh_eta = xp.sinh(eta_p)
        cos_xi = xp.cos(xi_p)
        tau_p = xp.sin(xi_p) / xp.sqrt(sinh_eta * sinh_eta + cos_xi * cos_xi)
        lam = xp.arctan2(sinh_eta, cos_xi)
        # invert the conformal latitude by the standard series
        phi = _conformal_to_geodetic(xp.arctan(tau_p), e * e, xp)
        lon = _r2d(xp, lam + lon0_rad)
        lat = _r2d(xp, phi)
        return lon, lat

    return forward, inverse


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area (ellipsoidal, Snyder 1987 §24 / EPSG 9820)
# ---------------------------------------------------------------------------


def make_lambert_azimuthal_equal_area(params: dict, ell: Ellipsoid):
    lon0 = float(params.get("longitude_of_projection_origin", 0.0))
    lat0 = float(params.get("latitude_of_projection_origin", 0.0))
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, e, e2 = ell.a, ell.e, ell.e2
    lam0 = math.radians(lon0)
    phi0 = math.radians(lat0)

    def _q_scalar(phi: float) -> float:
        s = math.sin(phi)
        if e == 0:
            return 2.0 * s
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    qp = _q_scalar(math.pi / 2)
    q0 = _q_scalar(phi0)
    beta0 = math.asin(min(1.0, max(-1.0, q0 / qp)))
    rq = a * math.sqrt(qp / 2.0)
    d = (
        a
        * math.cos(phi0)
        / math.sqrt(1 - e2 * math.sin(phi0) ** 2)
        / (rq * math.cos(beta0))
        if abs(math.cos(beta0)) > 1e-12
        else 1.0
    )
    sin_b0, cos_b0 = math.sin(beta0), math.cos(beta0)

    def _q(phi, xp):
        s = xp.sin(phi)
        if e == 0:
            return 2.0 * s
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * xp.log((1 - e * s) / (1 + e * s))
        )

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        q = _q(phi, xp)
        beta = xp.arcsin(xp.clip(q / qp, -1.0, 1.0))
        sin_b, cos_b = xp.sin(beta), xp.cos(beta)
        dlam = lam - lam0
        dlam = (dlam + math.pi) % (2 * math.pi) - math.pi
        cos_dl, sin_dl = xp.cos(dlam), xp.sin(dlam)
        denom = 1.0 + sin_b0 * sin_b + cos_b0 * cos_b * cos_dl
        b = rq * xp.sqrt(2.0 / denom)
        x = fe + b * d * cos_b * sin_dl
        y = fn + (b / d) * (cos_b0 * sin_b - sin_b0 * cos_b * cos_dl)
        return x, y

    def inverse(x, y, xp):
        xr = (x - fe) / d
        yr = d * (y - fn)
        rho = xp.sqrt(xr * xr + yr * yr)
        rho_safe = xp.where(rho == 0, 1.0, rho)
        c = 2.0 * xp.arcsin(xp.clip(rho / (2.0 * rq), -1.0, 1.0))
        sin_c, cos_c = xp.sin(c), xp.cos(c)
        beta = xp.where(
            rho == 0,
            beta0,
            xp.arcsin(
                xp.clip(cos_c * sin_b0 + yr * sin_c * cos_b0 / rho_safe, -1.0, 1.0)
            ),
        )
        lam = lam0 + xp.arctan2(
            xr * sin_c, rho_safe * cos_b0 * cos_c - yr * sin_b0 * sin_c
        )
        lam = xp.where(rho == 0, lam0, lam)
        # latitude from authalic latitude by the standard series
        # (Snyder 3-18): three sine terms, ~1e-10 rad for earth
        # ellipsoids — replaces a 6-step Newton iteration whose per-step
        # log/sin made the host inverse ~4x the forward's cost
        if e > 0:
            e4 = e2 * e2
            e6 = e4 * e2
            c2 = e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0
            c4 = 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0
            c6 = 761.0 * e6 / 45360.0
            phi = (
                beta
                + c2 * xp.sin(2.0 * beta)
                + c4 * xp.sin(4.0 * beta)
                + c6 * xp.sin(6.0 * beta)
            )
        else:
            phi = beta
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


# ---------------------------------------------------------------------------
# Mercator (spherical variant used by EPSG:3857, ellipsoidal by EPSG:3395)
# ---------------------------------------------------------------------------


def make_mercator(params: dict, ell: Ellipsoid):
    lon0 = float(params.get("longitude_of_projection_origin", 0.0))
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    spherical = bool(params.get("_spherical", False))
    a, e = ell.a, ell.e
    lam0 = math.radians(lon0)

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        x = fe + a * (lam - lam0)
        if spherical or e == 0:
            y = fn + a * xp.log(xp.tan(math.pi / 4 + phi / 2))
        else:
            es = e * xp.sin(phi)
            y = fn + a * xp.log(
                xp.tan(math.pi / 4 + phi / 2) * ((1 - es) / (1 + es)) ** (e / 2)
            )
        return x, y

    def inverse(x, y, xp):
        lam = lam0 + (x - fe) / a
        t = xp.exp(-(y - fn) / a)
        phi = math.pi / 2 - 2 * xp.arctan(t)
        if not (spherical or e == 0):
            phi = _conformal_to_geodetic(phi, e * e, xp)
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


# ---------------------------------------------------------------------------
# Rotated lat/lon (CF rotated_latitude_longitude) — spherical rotation
# ---------------------------------------------------------------------------


def make_rotated_latitude_longitude(params: dict, ell: Ellipsoid):
    pole_lat = math.radians(float(params.get("grid_north_pole_latitude", 90.0)))
    pole_lon = math.radians(float(params.get("grid_north_pole_longitude", 0.0)))
    # angle of rotation about the new pole
    lon_rot = math.radians(float(params.get("north_pole_grid_longitude", 0.0)))

    theta = math.pi / 2 - pole_lat  # rotation about y-axis
    sin_t, cos_t = math.sin(theta), math.cos(theta)

    def inverse(x, y, xp):
        # rotated (grid) coords -> true lon/lat, degrees in, degrees out
        lam = _d2r(xp, x) - lon_rot
        phi = _d2r(xp, y)
        cos_p = xp.cos(phi)
        xx = xp.cos(lam) * cos_p
        yy = xp.sin(lam) * cos_p
        zz = xp.sin(phi)
        x2 = cos_t * xx + sin_t * zz
        y2 = yy
        z2 = -sin_t * xx + cos_t * zz
        lat = xp.arcsin(xp.clip(z2, -1.0, 1.0))
        lon = xp.arctan2(y2, x2) + pole_lon + math.pi
        lon = (lon + math.pi) % (2 * math.pi) - math.pi
        return _r2d(xp, lon), _r2d(xp, lat)

    def forward(lon, lat, xp):
        # true lon/lat -> rotated coords
        lam = _d2r(xp, lon) - pole_lon - math.pi
        phi = _d2r(xp, lat)
        cos_p = xp.cos(phi)
        xx = xp.cos(lam) * cos_p
        yy = xp.sin(lam) * cos_p
        zz = xp.sin(phi)
        x2 = cos_t * xx - sin_t * zz
        y2 = yy
        z2 = sin_t * xx + cos_t * zz
        rlat = xp.arcsin(xp.clip(z2, -1.0, 1.0))
        rlon = xp.arctan2(y2, x2) + lon_rot
        rlon = (rlon + math.pi) % (2 * math.pi) - math.pi
        return _r2d(xp, rlon), _r2d(xp, rlat)

    return forward, inverse


# ---------------------------------------------------------------------------
# Lambert Conformal Conic (2SP, Snyder §15 / EPSG 9802)
# ---------------------------------------------------------------------------


def make_lambert_conformal_conic(params: dict, ell: Ellipsoid):
    sp = params.get("standard_parallel", params.get("latitude_of_projection_origin", 0.0))
    if isinstance(sp, (list, tuple)):
        sp1, sp2 = float(sp[0]), float(sp[-1])
    else:
        sp1 = sp2 = float(sp)
    lat0 = float(params.get("latitude_of_projection_origin", sp1))
    lon0 = float(params.get("longitude_of_central_meridian",
                            params.get("longitude_of_projection_origin", 0.0)))
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, e = ell.a, ell.e
    lam0 = math.radians(lon0)

    def _m(phi: float) -> float:
        return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    def _t_scalar(phi: float) -> float:
        es = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    p1, p2, p0 = map(math.radians, (sp1, sp2, lat0))
    m1, m2 = _m(p1), _m(p2)
    t1, t2, t0 = _t_scalar(p1), _t_scalar(p2), _t_scalar(p0)
    if abs(p1 - p2) > 1e-10:
        n_c = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    else:
        n_c = math.sin(p1)
    big_f = m1 / (n_c * t1**n_c)
    rho0 = a * big_f * t0**n_c

    def _t(phi, xp):
        es = e * xp.sin(phi)
        return xp.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        rho = a * big_f * _t(phi, xp) ** n_c
        gamma = n_c * ((lam - lam0 + math.pi) % (2 * math.pi) - math.pi)
        x = fe + rho * xp.sin(gamma)
        y = fn + rho0 - rho * xp.cos(gamma)
        return x, y

    def inverse(x, y, xp):
        xr = x - fe
        yr = rho0 - (y - fn)
        rho = xp.sqrt(xr * xr + yr * yr) * (1 if n_c >= 0 else -1)
        t = (rho / (a * big_f)) ** (1.0 / n_c)
        gamma = xp.arctan2(xr, yr)
        lam = gamma / n_c + lam0
        phi = _conformal_to_geodetic(math.pi / 2 - 2 * xp.arctan(t), e * e, xp)
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


# ---------------------------------------------------------------------------
# Albers Equal Area (Snyder §14 / EPSG 9822)
# ---------------------------------------------------------------------------


def make_albers_conical_equal_area(params: dict, ell: Ellipsoid):
    sp = params.get("standard_parallel", 0.0)
    if isinstance(sp, (list, tuple)):
        sp1, sp2 = float(sp[0]), float(sp[-1])
    else:
        sp1 = sp2 = float(sp)
    lat0 = float(params.get("latitude_of_projection_origin", 0.0))
    lon0 = float(params.get("longitude_of_central_meridian",
                            params.get("longitude_of_projection_origin", 0.0)))
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, e, e2 = ell.a, ell.e, ell.e2
    lam0 = math.radians(lon0)

    def _q_scalar(phi: float) -> float:
        s = math.sin(phi)
        if e == 0:
            return 2.0 * s
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    def _m(phi: float) -> float:
        return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    p1, p2, p0 = map(math.radians, (sp1, sp2, lat0))
    m1, m2 = _m(p1), _m(p2)
    q1, q2, q0 = _q_scalar(p1), _q_scalar(p2), _q_scalar(p0)
    if abs(p1 - p2) > 1e-10:
        n_c = (m1 * m1 - m2 * m2) / (q2 - q1)
    else:
        n_c = math.sin(p1)
    big_c = m1 * m1 + n_c * q1
    rho0 = a * math.sqrt(big_c - n_c * q0) / n_c

    def _q(phi, xp):
        s = xp.sin(phi)
        if e == 0:
            return 2.0 * s
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * xp.log((1 - e * s) / (1 + e * s))
        )

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        q = _q(phi, xp)
        rho = a * xp.sqrt(big_c - n_c * q) / n_c
        theta = n_c * ((lam - lam0 + math.pi) % (2 * math.pi) - math.pi)
        return fe + rho * xp.sin(theta), fn + rho0 - rho * xp.cos(theta)

    def inverse(x, y, xp):
        xr = x - fe
        yr = rho0 - (y - fn)
        rho = xp.sqrt(xr * xr + yr * yr)
        theta = xp.arctan2(xr, yr)
        q = (big_c - (rho * n_c / a) ** 2) / n_c
        lam = lam0 + theta / n_c
        if e > 0:
            qp = (1 - e2) * (
                1.0 / (1 - e2)
                - (1.0 / (2 * e)) * math.log((1 - e) / (1 + e))
            )
            beta = xp.arcsin(xp.clip(q / qp, -1.0, 1.0))
            phi = _authalic_to_geodetic(beta, e2, xp)
        else:
            phi = xp.arcsin(xp.clip(q / 2.0, -1.0, 1.0))
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


# ---------------------------------------------------------------------------
# Polar Stereographic (variant B, Snyder §21 / EPSG 9829)
# ---------------------------------------------------------------------------


def make_polar_stereographic(params: dict, ell: Ellipsoid):
    lat_ts = float(
        params.get(
            "standard_parallel", params.get("latitude_of_projection_origin", 90.0)
        )
    )
    lat0 = float(params.get("latitude_of_projection_origin", 90.0 if lat_ts > 0 else -90.0))
    lon0 = float(
        params.get(
            "straight_vertical_longitude_from_pole",
            params.get("longitude_of_projection_origin", 0.0),
        )
    )
    k0 = float(params.get("scale_factor_at_projection_origin", 1.0))
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, e = ell.a, ell.e
    south = lat0 < 0
    lam0 = math.radians(lon0)

    def _t_scalar(phi: float) -> float:
        es = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    if abs(lat_ts) < 89.999:
        pts = math.radians(abs(lat_ts))
        m_ts = math.cos(pts) / math.sqrt(1 - (e * math.sin(pts)) ** 2)
        t_ts = _t_scalar(pts)
        scale = a * m_ts / t_ts
    else:
        scale = (
            2 * a * k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        )

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        if south:
            lam = -lam
            phi = -phi
            lam_off = -lam0
        else:
            lam_off = lam0
        es = e * xp.sin(phi)
        t = xp.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)
        rho = scale * t
        dlam = lam - lam_off
        x = rho * xp.sin(dlam)
        y = -rho * xp.cos(dlam)
        if south:
            x, y = -x, -y
        return fe + x, fn + y

    def inverse(x, y, xp):
        xr = x - fe
        yr = y - fn
        if south:
            xr, yr = -xr, -yr
        rho = xp.sqrt(xr * xr + yr * yr)
        t = rho / scale
        phi = _conformal_to_geodetic(math.pi / 2 - 2 * xp.arctan(t), e * e, xp)
        lam = (lam0 if not south else -lam0) + xp.arctan2(xr, -yr)
        if south:
            lam, phi = -lam, -phi
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


def make_lambert_cylindrical_equal_area(params: dict, ell: Ellipsoid):
    """Lambert cylindrical equal-area, ellipsoidal (Snyder §10; the
    projection of the EASE-Grid 2.0 family, EPSG:6933).

    ``x = a k0 (lam - lam0)``, ``y = a q(phi) / (2 k0)`` with
    ``k0 = cos(phi_ts)/sqrt(1 - e^2 sin^2 phi_ts)``; the inverse recovers
    the geodetic latitude from the authalic ``q`` by the same Newton
    iteration as the other equal-area projections here."""
    lat_ts = float(
        params.get(
            "standard_parallel", params.get("latitude_of_true_scale", 0.0)
        )
    )
    lon0 = float(
        params.get(
            "longitude_of_central_meridian",
            params.get("longitude_of_projection_origin", 0.0),
        )
    )
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, e, e2 = ell.a, ell.e, ell.e2
    lam0 = math.radians(lon0)
    pts = math.radians(lat_ts)
    k0 = math.cos(pts) / math.sqrt(1 - e2 * math.sin(pts) ** 2)

    def _q(phi, xp):
        s = xp.sin(phi)
        if e == 0:
            return 2.0 * s
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            + (1 / (2 * e)) * xp.log((1 + e * s) / (1 - e * s))
        )

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        dlam = (lam - lam0 + math.pi) % (2 * math.pi) - math.pi
        return fe + a * k0 * dlam, fn + a * _q(phi, xp) / (2.0 * k0)

    if e > 0:
        qp = (1 - e2) * (
            1.0 / (1 - e2) + (1 / (2 * e)) * math.log((1 + e) / (1 - e))
        )
    else:
        qp = 2.0

    def inverse(x, y, xp):
        lam = lam0 + (x - fe) / (a * k0)
        q = 2.0 * k0 * (y - fn) / a
        if e == 0:
            phi = xp.arcsin(xp.clip(q / 2.0, -1.0, 1.0))
        else:
            beta = xp.arcsin(xp.clip(q / qp, -1.0, 1.0))
            phi = _authalic_to_geodetic(beta, e2, xp)
        lam = (lam + math.pi) % (2 * math.pi) - math.pi
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


def make_sinusoidal(params: dict, ell: Ellipsoid):
    """Sinusoidal (Sanson-Flamsteed) projection, ellipsoidal (Snyder
    SS30) — the projection of the MODIS land grid
    (``+proj=sinu +R=6371007.181``).

    ``x = a dlam cos(phi)/sqrt(1 - e^2 sin^2 phi)``, ``y = M(phi)`` the
    meridional arc; the inverse recovers ``phi`` from the rectifying
    latitude by the standard Snyder series (exact for the sphere, where
    ``y = a phi``)."""
    lon0 = float(
        params.get(
            "longitude_of_projection_origin",
            params.get("longitude_of_central_meridian", 0.0),
        )
    )
    fe = float(params.get("false_easting", 0.0))
    fn = float(params.get("false_northing", 0.0))
    a, e2 = ell.a, ell.e2
    e4, e6 = e2 * e2, e2 ** 3
    lam0 = math.radians(lon0)
    m0 = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    m2 = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    m4 = 15 * e4 / 256 + 45 * e6 / 1024
    m6 = 35 * e6 / 3072

    def forward(lon, lat, xp):
        lam = _d2r(xp, lon)
        phi = _d2r(xp, lat)
        dlam = (lam - lam0 + math.pi) % (2 * math.pi) - math.pi
        x = a * dlam * xp.cos(phi) / xp.sqrt(1 - e2 * xp.sin(phi) ** 2)
        y = a * (
            m0 * phi
            - m2 * xp.sin(2 * phi)
            + m4 * xp.sin(4 * phi)
            - m6 * xp.sin(6 * phi)
        )
        return fe + x, fn + y

    sqrt1me2 = math.sqrt(1 - e2)
    e1 = (1 - sqrt1me2) / (1 + sqrt1me2)
    e1_2, e1_3, e1_4 = e1 * e1, e1 ** 3, e1 ** 4
    p2 = 3 * e1 / 2 - 27 * e1_3 / 32
    p4 = 21 * e1_2 / 16 - 55 * e1_4 / 32
    p6 = 151 * e1_3 / 96
    p8 = 1097 * e1_4 / 512

    def inverse(x, y, xp):
        mu = (y - fn) / (a * m0)
        phi = (
            mu
            + p2 * xp.sin(2 * mu)
            + p4 * xp.sin(4 * mu)
            + p6 * xp.sin(6 * mu)
            + p8 * xp.sin(8 * mu)
        )
        cosphi = xp.cos(phi)
        # meridians converge at the poles: dlam is indeterminate there
        polar = xp.abs(cosphi) < 1e-12
        denom = a * xp.where(polar, 1.0, cosphi) / xp.sqrt(
            1 - e2 * xp.sin(phi) ** 2
        )
        dlam = xp.where(polar, 0.0, (x - fe) / denom)
        lam = (lam0 + dlam + math.pi) % (2 * math.pi) - math.pi
        return _r2d(xp, lam), _r2d(xp, phi)

    return forward, inverse


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

PROJECTION_FACTORIES = {
    "transverse_mercator": make_transverse_mercator,
    "lambert_azimuthal_equal_area": make_lambert_azimuthal_equal_area,
    "mercator": make_mercator,
    "rotated_latitude_longitude": make_rotated_latitude_longitude,
    "lambert_conformal_conic": make_lambert_conformal_conic,
    "albers_conical_equal_area": make_albers_conical_equal_area,
    "polar_stereographic": make_polar_stereographic,
    "lambert_cylindrical_equal_area": make_lambert_cylindrical_equal_area,
    "sinusoidal": make_sinusoidal,
}


def make_projection(name: str, params: dict, ell: Ellipsoid):
    try:
        factory = PROJECTION_FACTORIES[name]
    except KeyError:
        raise ValueError(f"unsupported projection {name!r}") from None
    return factory(params, ell)
