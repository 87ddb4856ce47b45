"""Dedicated CRS-engine tests: independent analytic / numerical checks of the
native projection math (no pyproj available in this environment).

These complement the golden-array suites: each projection family is verified
against closed forms (Mercator), independent numerical integration (meridian
arc for transverse Mercator), and differential-geometry invariants (Jacobian
determinant for the equal-area families, conformality for the conformal
ones) — properties no shared implementation bug can satisfy by accident.

Reference parity surface: xcube-resampling uses pyproj.CRS /
pyproj.Transformer (reference gridmapping/base.py, utils.py); the registry
and CF round-trips below pin the same observable behavior.
"""

import numpy as np
import pytest
from scipy.integrate import quad

from xcube_resampling_tpu.crs import CRS, Transformer
from xcube_resampling_tpu.crs.core import CRSError
from xcube_resampling_tpu.crs.datum import WGS84, GRS80

rng = np.random.default_rng(42)


def _scatter(lon_lim, lat_lim, n=200):
    lon = rng.uniform(*lon_lim, n)
    lat = rng.uniform(*lat_lim, n)
    return lon, lat


def _meridian_arc(lat_deg, ell):
    """Meridian arc length from the equator by direct numerical integration
    of a(1-e^2)(1-e^2 sin^2 phi)^(-3/2) — fully independent of the Krüger
    series used by the projection code."""
    e2 = ell.e2

    def integrand(p):
        return (1 - e2 * np.sin(p) ** 2) ** -1.5

    val, err = quad(integrand, 0.0, np.radians(lat_deg), epsabs=1e-13)
    assert err < 1e-6
    return ell.a * (1 - e2) * val


def _jacobian(fwd, lon, lat, h=1e-6):
    """Numerical Jacobian d(x,y)/d(lon_rad,lat_rad) at degree inputs."""
    hd = np.degrees(h)
    x_e, y_e = fwd(lon + hd, lat, np)
    x_w, y_w = fwd(lon - hd, lat, np)
    x_n, y_n = fwd(lon, lat + hd, np)
    x_s, y_s = fwd(lon, lat - hd, np)
    dxdl = (x_e - x_w) / (2 * h)
    dydl = (y_e - y_w) / (2 * h)
    dxdp = (x_n - x_s) / (2 * h)
    dydp = (y_n - y_s) / (2 * h)
    return dxdl, dydl, dxdp, dydp


# ---------------------------------------------------------------- registry


def test_epsg_registry_basics():
    wgs84 = CRS.from_epsg(4326)
    assert wgs84.is_geographic and not wgs84.is_projected
    assert wgs84.to_epsg() == 4326
    assert str(wgs84) == "EPSG:4326"
    assert "latitude" in wgs84.axis_info[0].name.lower()

    utm = CRS.from_epsg(32632)
    assert utm.is_projected
    assert utm.proj_name == "transverse_mercator"
    assert utm.ellipsoid.a == pytest.approx(6378137.0)

    with pytest.raises(CRSError):
        CRS.from_epsg(999999)


def test_from_string_forms():
    assert CRS.from_string("EPSG:3035").to_epsg() == 3035
    assert CRS.from_string("epsg:4326") == CRS.from_epsg(4326)
    assert CRS.from_user_input(32632).to_epsg() == 32632
    assert CRS.from_user_input(CRS.from_epsg(3857)).to_epsg() == 3857


@pytest.mark.parametrize(
    "code",
    [4326, 4258, 4269, 3035, 3857, 3395, 3031, 3413, 2154, 3034, 6933,
     32632, 32750],
)
def test_wkt_and_cf_round_trip(code):
    crs = CRS.from_epsg(code)
    assert CRS.from_wkt(crs.to_wkt()) == crs
    assert CRS.from_cf(crs.to_cf()).to_epsg() == code


# ----------------------------------------------------- exact origin points


@pytest.mark.parametrize(
    "code,lonlat,xy",
    [
        (32632, (9.0, 0.0), (500000.0, 0.0)),  # UTM natural origin
        (3035, (10.0, 52.0), (4321000.0, 3210000.0)),  # LAEA false origin
        (3857, (0.0, 0.0), (0.0, 0.0)),
        (3395, (0.0, 0.0), (0.0, 0.0)),
        (2154, (3.0, 46.5), (700000.0, 6600000.0)),  # Lambert-93 origin
        (3031, (0.0, -90.0), (0.0, 0.0)),  # south pole
        (3413, (-45.0, 90.0), (0.0, 0.0)),  # north pole
    ],
)
def test_projection_origins_exact(code, lonlat, xy):
    fwd, _ = CRS.from_epsg(code).projection()
    x, y = fwd(np.float64(lonlat[0]), np.float64(lonlat[1]), np)
    np.testing.assert_allclose([x, y], xy, atol=1e-6)


# -------------------------------------------------- closed-form references


def test_mercator_spherical_closed_form():
    """EPSG:3857 uses the WGS84 semi-major axis as a sphere radius."""
    fwd, _ = CRS.from_epsg(3857).projection()
    lon, lat = _scatter((-179, 179), (-84, 84))
    x, y = fwd(lon, lat, np)
    a = 6378137.0
    np.testing.assert_allclose(x, a * np.radians(lon), rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        y, a * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)), rtol=1e-14
    )


def test_mercator_ellipsoidal_closed_form():
    """EPSG:3395 y(lat) closed form with the conformal-latitude factor."""
    fwd, _ = CRS.from_epsg(3395).projection()
    lon, lat = _scatter((-179, 179), (-80, 80))
    x, y = fwd(lon, lat, np)
    a, e = WGS84.a, np.sqrt(WGS84.e2)
    phi = np.radians(lat)
    expect = a * np.log(
        np.tan(np.pi / 4 + phi / 2)
        * ((1 - e * np.sin(phi)) / (1 + e * np.sin(phi))) ** (e / 2)
    )
    np.testing.assert_allclose(x, a * np.radians(lon), atol=1e-6)
    np.testing.assert_allclose(y, expect, rtol=1e-13, atol=1e-7)


@pytest.mark.parametrize("lat", [-80.0, -33.3, 0.0, 12.5, 45.0, 63.0, 84.0])
def test_transverse_mercator_meridian_arc(lat):
    """On the central meridian, UTM northing is k0 * (meridian arc length):
    checks the Krüger series against direct numerical integration."""
    fwd, _ = CRS.from_epsg(32632).projection()
    x, y = fwd(np.float64(9.0), np.float64(lat), np)
    assert abs(float(x) - 500000.0) < 1e-6
    expect = 0.9996 * _meridian_arc(lat, WGS84)
    assert abs(float(y) - expect) < 1e-5  # 10 micrometres


def test_transverse_mercator_scale_at_central_meridian():
    fwd, _ = CRS.from_epsg(32632).projection()
    for lat in (0.0, 30.0, 60.0):
        dxdl, dydl, dxdp, dydp = _jacobian(fwd, 9.0, lat)
        phi = np.radians(lat)
        # meridional scale = |dy/dphi| / M(phi)
        m_rad = (
            WGS84.a * (1 - WGS84.e2) / (1 - WGS84.e2 * np.sin(phi) ** 2) ** 1.5
        )
        k = abs(dydp) / m_rad
        assert abs(k - 0.9996) < 1e-7


# ------------------------------------------- differential-geometry checks


@pytest.mark.parametrize("code", [3035, 6933])
def test_equal_area_jacobian_laea(code):
    """|det J| must equal a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2
    everywhere for an ellipsoidal equal-area projection."""
    crs = CRS.from_epsg(code)
    fwd, _ = crs.projection()
    ell = crs.ellipsoid
    lon, lat = _scatter((-10, 40), (30, 70), n=50)
    for lo, la in zip(lon, lat):
        dxdl, dydl, dxdp, dydp = _jacobian(fwd, lo, la)
        det = abs(dxdl * dydp - dydl * dxdp)
        phi = np.radians(la)
        expect = (
            ell.a**2
            * (1 - ell.e2)
            * np.cos(phi)
            / (1 - ell.e2 * np.sin(phi) ** 2) ** 2
        )
        assert abs(det / expect - 1) < 1e-6


@pytest.mark.parametrize("code", [3857, 3395, 2154, 3034, 3031, 32632])
def test_conformal_projections_are_conformal(code):
    """Conformal maps: the Jacobian columns (scaled to isometric coords) are
    orthogonal and equal length — angle preservation to ~1e-6."""
    crs = CRS.from_epsg(code)
    fwd, _ = crs.projection()
    ell = crs.ellipsoid
    a, e2 = ell.a, (0.0 if code == 3857 else ell.e2)
    if code == 3031:
        domain = ((-179, 179), (-85, -62))
    elif code in (2154, 3034):
        domain = ((-4, 9), (42, 50))
    else:
        domain = ((3, 15), (-70, 70))
    lon, lat = _scatter(*domain, n=40)
    for lo, la in zip(lon, lat):
        dxdl, dydl, dxdp, dydp = _jacobian(fwd, lo, la)
        phi = np.radians(la)
        w = 1 - e2 * np.sin(phi) ** 2
        n_rad = a / np.sqrt(w)  # prime-vertical radius
        m_rad = a * (1 - e2) / w**1.5  # meridional radius
        # per-radian scales along parallel / meridian
        u = np.array([dxdl, dydl]) / (n_rad * np.cos(phi))
        v = np.array([dxdp, dydp]) / m_rad
        assert abs(np.dot(u, v)) / (
            np.linalg.norm(u) * np.linalg.norm(v)
        ) < 1e-5
        assert abs(np.linalg.norm(u) / np.linalg.norm(v) - 1) < 1e-5


# ----------------------------------------------------------- round trips


@pytest.mark.parametrize(
    "code,domain",
    [
        (32632, ((3, 15), (-79, 84))),
        (32750, ((111, 123), (-79, 5))),
        (3035, ((-15, 45), (25, 75))),
        (3857, ((-179, 179), (-85, 85))),
        (3395, ((-179, 179), (-80, 80))),
        (3031, ((-179, 179), (-88, -60))),
        (3413, ((-179, 179), (58, 88))),
        (2154, ((-5, 10), (41, 51))),
        (5243, ((5, 15), (47, 55))),
        (3034, ((-10, 30), (35, 70))),
        (6933, ((-179, 179), (-85, 85))),
    ],
)
def test_forward_inverse_round_trip(code, domain):
    fwd, inv = CRS.from_epsg(code).projection()
    lon, lat = _scatter(*domain)
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    # longitude compares modulo 360 (polar CRSs with offset central
    # meridians legitimately re-wrap into (-180, 180])
    dlon = (np.asarray(lon2) - lon + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(dlon, 0.0, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_rotated_pole_round_trip():
    crs = CRS.from_cf(
        dict(
            grid_mapping_name="rotated_latitude_longitude",
            grid_north_pole_longitude=-162.0,
            grid_north_pole_latitude=39.25,
            semi_major_axis=WGS84.a,
            inverse_flattening=WGS84.inverse_flattening,
        )
    )
    assert crs.is_geographic
    fwd, inv = crs.projection()
    lon, lat = _scatter((-40, 60), (20, 75))
    rlon, rlat = fwd(lon, lat, np)
    lon2, lat2 = inv(rlon, rlat, np)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


# ----------------------------------------------------------- transformer


def test_ease_grid_2_extent():
    """EASE-Grid 2.0 global (EPSG:6933): the published grid half-extent is
    x(180 deg) = 17367530.445161 m (NSIDC EASE-Grid 2.0 definition)."""
    fwd, inv = CRS.from_epsg(6933).projection()
    x, y = fwd(np.float64(179.9999999), np.float64(0.0), np)
    assert abs(abs(float(x)) - 17367530.445161) < 0.1
    x0, y0 = fwd(np.float64(0.0), np.float64(0.0), np)
    np.testing.assert_allclose([x0, y0], [0.0, 0.0], atol=1e-9)
    # equal-area identity: the full map rectangle's area equals the
    # ellipsoid's surface area S = 2 pi a^2 (1 + (1-e^2)/e * atanh(e))
    _, yp = fwd(np.float64(0.0), np.float64(90.0), np)
    a, e = WGS84.a, np.sqrt(WGS84.e2)
    surface = 2 * np.pi * a**2 * (1 + (1 - e * e) / e * np.arctanh(e))
    map_area = (2 * abs(float(x))) * (2 * float(yp))
    assert abs(map_area / surface - 1) < 1e-7


def test_transformer_identity():
    t = Transformer.from_crs(CRS.from_epsg(4326), CRS.from_epsg(4326))
    assert t.is_identity
    x, y = t.transform(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    np.testing.assert_array_equal(x, [1.0, 2.0])
    np.testing.assert_array_equal(y, [3.0, 4.0])


def test_transformer_composition_consistency():
    """4326 -> 32632 -> 3035 must agree with the direct 4326 -> 3035."""
    lon, lat = _scatter((4, 14), (45, 60))
    a = Transformer.from_crs("EPSG:4326", "EPSG:32632")
    b = Transformer.from_crs("EPSG:32632", "EPSG:3035")
    c = Transformer.from_crs("EPSG:4326", "EPSG:3035")
    x1, y1 = b.transform(*a.transform(lon, lat))
    x2, y2 = c.transform(lon, lat)
    np.testing.assert_allclose(x1, x2, atol=1e-5)
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_transformer_datum_etrs89_wgs84_equivalence():
    """ETRS89 (GRS80) <-> WGS84 geographic is treated as a null datum shift
    (reference behavior: pyproj's ballpark transform without a shift grid)."""
    t = Transformer.from_crs("EPSG:4258", "EPSG:4326")
    lon, lat = _scatter((-10, 30), (35, 70))
    lon2, lat2 = t.transform(lon, lat)
    np.testing.assert_allclose(lon2, lon, atol=1e-12)
    np.testing.assert_allclose(lat2, lat, atol=1e-12)


def test_transform_bounds_contains_interior():
    t = Transformer.from_crs("EPSG:4326", "EPSG:3035")
    bounds = t.transform_bounds(-10.0, 35.0, 30.0, 70.0)
    lon, lat = _scatter((-10, 30), (35, 70))
    x, y = t.transform(lon, lat)
    assert bounds[0] <= x.min() and x.max() <= bounds[2]
    assert bounds[1] <= y.min() and y.max() <= bounds[3]


def test_transform_fn_jax_traceable():
    import jax
    import jax.numpy as jnp

    t = Transformer.from_crs("EPSG:4326", "EPSG:32632")
    fn = t.transform_fn()

    @jax.jit
    def run(lon, lat):
        return fn(lon, lat, jnp)

    lon = jnp.linspace(4.0, 14.0, 64)
    lat = jnp.linspace(45.0, 60.0, 64)
    x, y = run(lon, lat)
    xe, ye = t.transform(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    np.testing.assert_allclose(np.asarray(x), xe, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(y), ye, rtol=1e-9)


def test_grs80_wgs84_ellipsoid_constants():
    assert WGS84.a == 6378137.0
    assert WGS84.inverse_flattening == pytest.approx(298.257223563)
    assert GRS80.inverse_flattening == pytest.approx(298.257222101)
    assert abs(WGS84.b - 6356752.3142) < 1e-4
    assert abs(GRS80.b - 6356752.3141) < 1e-4


def test_sinusoidal_modis_sphere():
    """MODIS land grid (+proj=sinu +R=6371007.181): spherical sinusoidal
    is analytic — x = R dlam cos(phi), y = R phi."""
    crs = CRS.from_user_input(
        "+proj=sinu +R=6371007.181 +lon_0=0 +x_0=0 +y_0=0 +units=m +no_defs"
    )
    fwd, inv = crs.projection()
    R = 6371007.181
    x, y = fwd(np.float64(10.0), np.float64(45.0), np)
    np.testing.assert_allclose(
        [x, y],
        [R * np.radians(10.0) * np.cos(np.radians(45.0)), R * np.radians(45.0)],
        rtol=1e-12,
    )
    lon2, lat2 = inv(x, y, np)
    np.testing.assert_allclose([lon2, lat2], [10.0, 45.0], atol=1e-9)
    # pole: inverse longitude is defined as lon_0
    xp_, yp_ = fwd(np.float64(33.0), np.float64(90.0), np)
    lonp, latp = inv(xp_, yp_, np)
    np.testing.assert_allclose(latp, 90.0, atol=1e-9)


def test_sinusoidal_wgs84_meridian_arc():
    """Ellipsoidal sinusoidal: y(90 deg) is the WGS84 quarter meridian
    (10001965.7293 m); forward/inverse round-trips over the globe."""
    fwd, inv = CRS.from_proj4("+proj=sinu +ellps=WGS84 +lon_0=0").projection()
    _, yq = fwd(np.float64(0.0), np.float64(90.0), np)
    assert abs(float(yq) - 10001965.7293) < 0.01
    lons = np.linspace(-179.0, 179.0, 41)
    lats = np.linspace(-89.0, 89.0, 41)
    x, y = fwd(lons, lats, np)
    lon2, lat2 = inv(x, y, np)
    np.testing.assert_allclose(lon2, lons, atol=1e-6)
    np.testing.assert_allclose(lat2, lats, atol=1e-7)


def test_sinusoidal_wkt_and_cf_inputs():
    wkt = (
        'PROJCS["MODIS Sinusoidal",GEOGCS["Unknown datum based upon the '
        'custom spheroid",DATUM["Not specified",'
        'SPHEROID["Custom spheroid",6371007.181,0]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],PROJECTION["Sinusoidal"],'
        'PARAMETER["longitude_of_center",0],PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]'
    )
    c_wkt = CRS.from_user_input(wkt)
    c_p4 = CRS.from_proj4("+proj=sinu +R=6371007.181 +lon_0=0")
    c_cf = CRS.from_cf(
        {
            "grid_mapping_name": "sinusoidal",
            "longitude_of_projection_origin": 0.0,
            "false_easting": 0.0,
            "false_northing": 0.0,
            "semi_major_axis": 6371007.181,
            "inverse_flattening": 0.0,
        }
    )
    pt = (np.float64(-7.3), np.float64(52.5))
    ref = CRS.from_user_input("+proj=sinu +R=6371007.181").projection()[0](*pt, np)
    for c in (c_wkt, c_p4, c_cf):
        got = c.projection()[0](*pt, np)
        np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_ob_tran_proj4_matches_cf_rotated_pole():
    """+proj=ob_tran pole longitude: PROJ defines lon_0 = 180 + the CF
    grid_north_pole_longitude, so parsing must recover lon_0 - 180 (a sign
    error here only cancels when lon_0 is a multiple of 180)."""
    p4 = CRS.from_proj4(
        "+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +o_lon_p=0 "
        "+lon_0=18 +ellps=WGS84"
    )
    cf = CRS.from_cf(
        dict(
            grid_mapping_name="rotated_latitude_longitude",
            grid_north_pole_longitude=-162.0,
            grid_north_pole_latitude=39.25,
            semi_major_axis=WGS84.a,
            inverse_flattening=WGS84.inverse_flattening,
        )
    )
    lon, lat = _scatter((-40, 60), (20, 75))
    for f_p4, f_cf in zip(p4.projection(), cf.projection()):
        a = f_p4(lon, lat, np)
        b = f_cf(lon, lat, np)
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_datumless_proj4_does_not_acquire_helmert_shift():
    """'+proj=utm +zone=28 +ellps=intl' has no datum: matching it to the
    ED50 EPSG entry would silently apply the -87,-98,-121 m shift.  PROJ
    treats a datum-less CRS as an unshifted ballpark frame."""
    crs = CRS.from_proj4("+proj=utm +zone=28 +ellps=intl")
    assert crs.to_epsg() != 23028
    from xcube_resampling_tpu.crs.transformer import _effective_towgs84

    t = _effective_towgs84(crs)
    assert t is None or not any(t)


# ------------------------------------------- round-3 projection families


def _conformality(fwd, ell, lon, lat, e2=None):
    """Max conformality violation (angle + scale-ratio) over scatter points."""
    a = ell.a
    e2 = ell.e2 if e2 is None else e2
    worst = 0.0
    for lo, la in zip(lon, lat):
        dxdl, dydl, dxdp, dydp = _jacobian(fwd, lo, la)
        phi = np.radians(la)
        w = 1 - e2 * np.sin(phi) ** 2
        n_rad = a / np.sqrt(w)
        m_rad = a * (1 - e2) / w**1.5
        u = np.array([dxdl, dydl]) / (n_rad * np.cos(phi))
        v = np.array([dxdp, dydp]) / m_rad
        worst = max(
            worst,
            abs(np.dot(u, v)) / (np.linalg.norm(u) * np.linalg.norm(v)),
            abs(np.linalg.norm(u) / np.linalg.norm(v) - 1),
        )
    return worst


def test_rd_new_epsg_worked_example():
    """EPSG Guidance Note 7-2 worked example for method 9809 (Oblique
    Stereographic): Amersfoort / RD New, 53N 6E -> 196105.283 / 557057.739."""
    crs = CRS.from_epsg(28992)
    fwd, inv = crs.projection()
    x, y = fwd(np.float64(6.0), np.float64(53.0), np)
    assert abs(x - 196105.283) < 2e-3
    assert abs(y - 557057.739) < 2e-3
    # the published coordinates are rounded to mm (~3.6e-9 deg of lat)
    lon, lat = inv(np.float64(196105.283), np.float64(557057.739), np)
    assert abs(lon - 6.0) < 1e-7
    assert abs(lat - 53.0) < 1e-7
    # the exact round trip is f64-tight
    lon, lat = inv(x, y, np)
    assert abs(lon - 6.0) < 1e-11
    assert abs(lat - 53.0) < 1e-11


def test_oblique_stereographic_is_conformal():
    """The double stereographic is conformal by construction; verify the
    differential invariant over the Dutch domain."""
    crs = CRS.from_epsg(28992)
    fwd, _ = crs.projection()
    lon, lat = _scatter((3.2, 7.2), (50.7, 53.6), n=40)
    assert _conformality(fwd, crs.ellipsoid, lon, lat) < 1e-5


def test_oblique_stereographic_scale_at_origin():
    """Local linear scale at the projection origin equals k0."""
    crs = CRS.from_epsg(28992)
    fwd, _ = crs.projection()
    ell = crs.ellipsoid
    lat0, lon0 = 52.15616055555555, 5.38763888888889
    dxdl, dydl, dxdp, dydp = _jacobian(fwd, lon0, lat0)
    phi = np.radians(lat0)
    w = 1 - ell.e2 * np.sin(phi) ** 2
    k_parallel = np.hypot(dxdl, dydl) / (ell.a / np.sqrt(w) * np.cos(phi))
    assert abs(k_parallel - 0.9999079) < 1e-7


def test_stereographic_oblique_and_equatorial():
    """General +proj=stere: conformality off the poles and exact
    round-trips; a polar center stays identified with the polar variant
    (EPSG:3413 parity)."""
    s = CRS.from_string("+proj=stere +lat_0=59 +lon_0=18 +k=0.9999 +ellps=GRS80")
    fwd, inv = s.projection()
    lon, lat = _scatter((10, 26), (52, 66), n=30)
    assert _conformality(fwd, s.ellipsoid, lon, lat) < 1e-5
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=5e-9)

    eq = CRS.from_string("+proj=stere +lat_0=0 +lon_0=-30 +ellps=WGS84")
    fwd, inv = eq.projection()
    lon, lat = _scatter((-50, -10), (-25, 25), n=30)
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=5e-9)

    polar = CRS.from_string(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84"
    )
    ref = CRS.from_epsg(3413)
    pf, _ = polar.projection()
    rf, _ = ref.projection()
    for lo, la in [(-30.0, 75.0), (10.0, 82.0), (-120.0, 68.0)]:
        xa, ya = pf(np.float64(lo), np.float64(la), np)
        xb, yb = rf(np.float64(lo), np.float64(la), np)
        assert abs(xa - xb) < 1e-6 and abs(ya - yb) < 1e-6


def test_orthographic_epsg_worked_example():
    """EPSG Guidance Note 7-2 worked example for method 9840 (ellipsoidal
    orthographic, WGS84, origin 55N 5E)."""
    crs = CRS.from_cf(
        {
            "grid_mapping_name": "orthographic",
            "latitude_of_projection_origin": 55.0,
            "longitude_of_projection_origin": 5.0,
        }
    )
    fwd, inv = crs.projection()
    lat = 53 + 48 / 60 + 33.82 / 3600
    lon = 2 + 7 / 60 + 46.38 / 3600
    x, y = fwd(np.float64(lon), np.float64(lat), np)
    assert abs(x - (-189011.711)) < 2e-3
    assert abs(y - (-128640.567)) < 2e-3
    lon2, lat2 = inv(x, y, np)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


def test_orthographic_round_trip_visible_hemisphere():
    """Newton inverse converges to f64 precision across the visible
    hemisphere (not only near the origin)."""
    crs = CRS.from_cf(
        {
            "grid_mapping_name": "orthographic",
            "latitude_of_projection_origin": 40.0,
            "longitude_of_projection_origin": -100.0,
        }
    )
    fwd, inv = crs.projection()
    lon, lat = _scatter((-160, -40), (-15, 85), n=150)
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)


def test_geostationary_goes_worked_example():
    """GOES-R Product User Guide fixed-grid example (sweep x, GRS80,
    lon0=-75): geodetic (33.846162N, 84.690932W) <-> scan angles
    (x=-0.024052, y=0.095340) rad."""
    h = 35786023.0
    crs = CRS.from_cf(
        {
            "grid_mapping_name": "geostationary",
            "perspective_point_height": h,
            "longitude_of_projection_origin": -75.0,
            "sweep_angle_axis": "x",
            "semi_major_axis": 6378137.0,
            "inverse_flattening": 298.257222096,
        }
    )
    fwd, inv = crs.projection()
    x, y = fwd(np.float64(-84.690932), np.float64(33.846162), np)
    assert abs(x / h - (-0.024052)) < 2e-6
    assert abs(y / h - 0.095340) < 2e-6
    lon, lat = inv(x, y, np)
    assert abs(lon - (-84.690932)) < 1e-6
    assert abs(lat - 33.846162) < 1e-6
    # sub-satellite point is the origin
    x0, y0 = fwd(np.float64(-75.0), np.float64(0.0), np)
    assert abs(x0) < 1e-6 and abs(y0) < 1e-6


def test_geostationary_sweep_axes_differ_and_limb_is_nan():
    """Sweep x vs sweep y swap the scan-angle decomposition (they agree on
    the axes, differ off-axis); the far side of the earth is not visible."""
    base = {
        "grid_mapping_name": "geostationary",
        "perspective_point_height": 35785831.0,
        "longitude_of_projection_origin": 0.0,
    }
    fx, ix_ = CRS.from_cf({**base, "sweep_angle_axis": "x"}).projection()
    fy, iy_ = CRS.from_cf({**base, "sweep_angle_axis": "y"}).projection()
    xa, ya = fx(np.float64(30.0), np.float64(40.0), np)
    xb, yb = fy(np.float64(30.0), np.float64(40.0), np)
    assert abs(xa - xb) > 100.0 and abs(ya - yb) > 100.0
    # each sweep's own inverse round-trips
    for f, i in ((fx, ix_), (fy, iy_)):
        x, y = f(np.float64(30.0), np.float64(40.0), np)
        lon, lat = i(x, y, np)
        assert abs(lon - 30.0) < 1e-8 and abs(lat - 40.0) < 1e-8
    # antipode of the sub-satellite point: hidden behind the limb
    x, y = fx(np.float64(180.0), np.float64(0.0), np)
    assert np.isnan(x) and np.isnan(y)
    # CF alternative spelling: fixed_angle_axis x == sweep_angle_axis y
    ff, _ = CRS.from_cf({**base, "fixed_angle_axis": "x"}).projection()
    xc, yc = ff(np.float64(30.0), np.float64(40.0), np)
    assert abs(xc - xb) < 1e-6 and abs(yc - yb) < 1e-6


def test_tm_south_orientated_lo_grid():
    """Hartebeesthoek94 / Lo29 (EPSG:2053): westings/southings are the
    negated natural TM coordinates; round-trips are exact."""
    lo29 = CRS.from_epsg(2053)
    fwd, inv = lo29.projection()
    tm = CRS.from_string("+proj=tmerc +lat_0=0 +lon_0=29 +k=1 +ellps=WGS84")
    tf, _ = tm.projection()
    for lo, la in [(28.0, -29.0), (30.5, -33.9), (29.0, -26.2)]:
        x, y = fwd(np.float64(lo), np.float64(la), np)
        xe, yn = tf(np.float64(lo), np.float64(la), np)
        assert abs(x - (-xe)) < 1e-6
        assert abs(y - (-yn)) < 1e-6
        lon2, lat2 = inv(x, y, np)
        assert abs(lon2 - lo) < 1e-9 and abs(lat2 - la) < 1e-9
    # a point west of the central meridian, south of the equator has
    # positive westing and southing
    x, y = fwd(np.float64(28.0), np.float64(-29.0), np)
    assert x > 0 and y > 0
    # proj4 spelling
    p = CRS.from_string(
        "+proj=tmerc +lat_0=0 +lon_0=29 +k=1 +axis=wsu +ellps=WGS84"
    )
    pf, _ = p.projection()
    xa, ya = pf(np.float64(28.0), np.float64(-29.0), np)
    assert abs(xa - x) < 1e-6 and abs(ya - y) < 1e-6


@pytest.mark.parametrize("code", [28992, 2046, 2053])
def test_new_families_wkt_cf_round_trip(code):
    """to_wkt/from_wkt and to_cf/from_cf preserve the new projection
    families' forward transforms."""
    crs = CRS.from_epsg(code)
    fwd, _ = crs.projection()
    for rebuilt in (CRS.from_wkt(crs.to_wkt()), CRS.from_cf(crs.to_cf())):
        f2, _ = rebuilt.projection()
        x1, y1 = fwd(np.float64(20.0), np.float64(-29.0), np)
        x2, y2 = f2(np.float64(20.0), np.float64(-29.0), np)
        assert abs(x1 - x2) < 1e-6 and abs(y1 - y2) < 1e-6


def test_swiss_oblique_mercator_rigi():
    """swisstopo's official LV03 reference point (Rigi) reproduces to
    sub-mm through the EPSG 9814 double projection; Bern's origin maps to
    the false origin exactly."""
    lv03 = CRS.from_epsg(21781)
    fwd, inv = lv03.projection()
    lat = 47 + 3 / 60 + 28.956559 / 3600
    lon = 8 + 29 / 60 + 11.111272 / 3600
    x, y = fwd(np.float64(lon), np.float64(lat), np)
    # the published reference decimals are truncated to cm-ish precision
    assert abs(x - 679520.05) < 2e-3
    assert abs(y - 212273.44) < 2e-3
    lon2, lat2 = inv(x, y, np)
    assert abs(lon2 - lon) < 1e-10 and abs(lat2 - lat) < 1e-10
    x0, y0 = fwd(np.float64(7.439583333333333),
                 np.float64(46.952405555555565), np)
    assert abs(x0 - 600000.0) < 1e-6 and abs(y0 - 200000.0) < 1e-6


def test_swiss_oblique_mercator_is_conformal():
    """EPSG 9814 is conformal: the numerical Jacobian's two column
    norms (scaled to isometric units) agree and the columns are
    orthogonal."""
    fwd, _ = CRS.from_epsg(2056).projection()
    lon, lat = _scatter((6.0, 10.5), (45.8, 47.8), 64)
    dxdl, dydl, dxdp, dydp = _jacobian(fwd, lon, lat)
    phi = np.radians(lat)
    e2 = CRS.from_epsg(2056).ellipsoid.e2
    w2 = 1 - e2 * np.sin(phi) ** 2
    # isometric scaling: d(lon) direction ~ nu cos(phi), d(lat) ~ rho
    nu_cos = np.cos(phi) / np.sqrt(w2)
    rho = (1 - e2) / w2 ** 1.5
    h_l = np.hypot(dxdl, dydl) / nu_cos
    h_p = np.hypot(dxdp, dydp) / rho
    assert np.allclose(h_l, h_p, rtol=1e-6)
    dot = (dxdl * dxdp + dydl * dydp)
    assert np.all(np.abs(dot) / (h_l * h_p) < 1e-5)


def test_oblique_mercator_rso_borneo_worked_example():
    """EPSG guidance note 7-2 worked example for Timbalai 1948 / RSO
    Borneo (Hotine variant B, EPSG 9815)."""
    crs = CRS.from_string(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582466666667 "
        "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
        "+y_0=442857.65 +a=6377298.556 +rf=300.8017"
    )
    fwd, inv = crs.projection()
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    x, y = fwd(np.float64(lon), np.float64(lat), np)
    assert abs(x - 679245.73) < 0.02
    assert abs(y - 596562.78) < 0.02
    lon2, lat2 = inv(x, y, np)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


def test_oblique_mercator_variant_a_offsets_differ():
    """+no_uoff (EPSG 9812) drops the centre offset: same geometry, u
    axis origin at the aposphere natural origin instead."""
    base = (
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582466666667 "
        "+gamma=53.13010236111111 +k=0.99984 +a=6377298.556 +rf=300.8017"
    )
    fb, _ = CRS.from_string(base).projection()
    fa, ia = CRS.from_string(base + " +no_uoff").projection()
    x_b, y_b = fb(np.float64(115.5), np.float64(5.0), np)
    x_a, y_a = fa(np.float64(115.5), np.float64(5.0), np)
    # variant A equals variant B plus a constant skew-axis shift
    du = (y_a - y_b)
    dv = (x_a - x_b)
    x_b2, y_b2 = fb(np.float64(114.2), np.float64(4.4), np)
    x_a2, y_a2 = fa(np.float64(114.2), np.float64(4.4), np)
    assert abs((y_a2 - y_b2) - du) < 1e-6
    assert abs((x_a2 - x_b2) - dv) < 1e-6
    assert abs(du) > 1.0  # the offset actually exists
    # WKT round trip keeps variant A (method-name encoded)
    crs_a = CRS.from_string(base + " +no_uoff")
    rebuilt = CRS.from_wkt(crs_a.to_wkt())
    fr, _ = rebuilt.projection()
    xr, yr = fr(np.float64(115.5), np.float64(5.0), np)
    assert abs(xr - x_a) < 1e-6 and abs(yr - y_a) < 1e-6


def test_equirectangular_meridian_arc_and_epsg4087():
    """Ellipsoidal eqc (EPSG 1028): y equals the meridian arc length
    (independent numerical integration); x is linear in longitude."""
    crs = CRS.from_epsg(4087)
    fwd, inv = crs.projection()
    for lat in (0.0, 23.5, 45.0, 67.0, 89.0):
        x, y = fwd(np.float64(12.0), np.float64(lat), np)
        assert abs(y - _meridian_arc(lat, WGS84)) < 1e-5
    x, y = fwd(np.float64(90.0), np.float64(0.0), np)
    assert abs(x - WGS84.a * np.pi / 2) < 1e-6
    lon, lat = _scatter((-179.0, 179.0), (-89.0, 89.0), 128)
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    assert np.allclose(lon2, lon, atol=1e-9)
    assert np.allclose(lat2, lat, atol=1e-9)


def test_mollweide_area_and_shape():
    """Mollweide invariants: the map is the standard 2:1 ellipse with
    total area 4 pi R^2 (equal-area), and known node values match."""
    crs = CRS.from_string("+proj=moll +ellps=WGS84")
    fwd, inv = crs.projection()
    r = WGS84.a
    # full-globe corners: equator edge x = 2 sqrt2 R, pole y = sqrt2 R
    x, y = fwd(np.float64(180.0 - 1e-9), np.float64(0.0), np)
    assert abs(x - 2 * np.sqrt(2) * r) < 0.1
    x, y = fwd(np.float64(0.0), np.float64(90.0), np)
    assert abs(y - np.sqrt(2) * r) < 1e-6
    # equal-area: Jacobian determinant == R^2 cos(phi) everywhere
    lon, lat = _scatter((-170.0, 170.0), (-85.0, 85.0), 128)
    dxdl, dydl, dxdp, dydp = _jacobian(fwd, lon, lat)
    det = dxdl * dydp - dxdp * dydl
    assert np.allclose(det, r * r * np.cos(np.radians(lat)), rtol=1e-4)
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    assert np.allclose(lon2, lon, atol=1e-8)
    assert np.allclose(lat2, lat, atol=1e-8)


def test_azimuthal_equidistant_radial_distances_are_geodesic():
    """aeqd's defining property: the map distance from the centre equals
    the geodesic distance (checked along a meridian against the meridian
    arc integral), and azimuths are preserved."""
    crs = CRS.from_string("+proj=aeqd +lat_0=0 +lon_0=10 +ellps=WGS84")
    fwd, inv = crs.projection()
    # along the central meridian the geodesic IS the meridian arc
    for lat in (10.0, 35.0, 60.0, 85.0):
        x, y = fwd(np.float64(10.0), np.float64(lat), np)
        assert abs(x) < 1e-6
        assert abs(y - _meridian_arc(lat, WGS84)) < 5e-4
    # oblique scatter: round trip through Vincenty direct/inverse
    lon, lat = _scatter((-60.0, 80.0), (-60.0, 60.0), 64)
    x, y = fwd(lon, lat, np)
    lon2, lat2 = inv(x, y, np)
    assert np.allclose(lon2, lon, atol=1e-8)
    assert np.allclose(lat2, lat, atol=1e-8)


def test_azimuthal_equidistant_polar_and_spherical():
    """Polar-aspect ellipsoidal aeqd uses the exact meridian arc; the
    spherical branch is the closed form with angular distance."""
    crs = CRS.from_string("+proj=aeqd +lat_0=90 +lon_0=0 +ellps=WGS84")
    fwd, inv = crs.projection()
    x, y = fwd(np.float64(0.0), np.float64(60.0), np)
    rho_expect = _meridian_arc(90.0, WGS84) - _meridian_arc(60.0, WGS84)
    assert abs(x) < 1e-6 and abs(-y - rho_expect) < 1e-5
    lon2, lat2 = inv(x, y, np)
    assert abs(lon2 - 0.0) < 1e-9 and abs(lat2 - 60.0) < 1e-9
    sph = CRS.from_string("+proj=aeqd +lat_0=40 +lon_0=-100 +R=6371000")
    fs, is_ = sph.projection()
    # spherical: distance = R * central angle
    x, y = fs(np.float64(-100.0), np.float64(50.0), np)
    assert abs(y - 6371000 * np.radians(10.0)) < 1e-6
    lon, lat = _scatter((-170.0, -30.0), (-40.0, 85.0), 64)
    x, y = fs(lon, lat, np)
    lon2, lat2 = is_(x, y, np)
    assert np.allclose(lon2, lon, atol=1e-9)
    assert np.allclose(lat2, lat, atol=1e-9)


def test_vertical_perspective_limb_and_round_trip():
    """nsper: the sub-satellite point maps to the origin, the limb is
    NaN, and visible points round-trip."""
    crs = CRS.from_string(
        "+proj=nsper +h=35785831 +lat_0=10 +lon_0=25 +ellps=WGS84"
    )
    fwd, inv = crs.projection()
    x, y = fwd(np.float64(25.0), np.float64(10.0), np)
    assert abs(x) < 1e-9 and abs(y) < 1e-9
    # far side of the earth is not visible
    x, y = fwd(np.float64(-155.0), np.float64(-10.0), np)
    assert np.isnan(x) and np.isnan(y)
    lon, lat = _scatter((0.0, 50.0), (-20.0, 40.0), 64)
    x, y = fwd(lon, lat, np)
    assert np.isfinite(x).all()
    lon2, lat2 = inv(x, y, np)
    assert np.allclose(lon2, lon, atol=1e-8)
    assert np.allclose(lat2, lat, atol=1e-8)


@pytest.mark.parametrize(
    "code_or_proj4",
    [
        2056,
        21781,
        4087,
        "+proj=moll +lon_0=10 +ellps=WGS84",
        "+proj=aeqd +lat_0=52 +lon_0=5 +ellps=GRS80",
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.316 +gamma=53.13 "
        "+k=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=GRS80",
        "+proj=nsper +h=35785831 +lat_0=0 +lon_0=140 +ellps=WGS84",
    ],
)
def test_round3_families_wkt_cf_round_trip(code_or_proj4):
    """WKT and CF round trips preserve the forward transform for every
    round-3 projection family."""
    crs = (
        CRS.from_epsg(code_or_proj4)
        if isinstance(code_or_proj4, int)
        else CRS.from_string(code_or_proj4)
    )
    fwd, _ = crs.projection()
    probe_lon, probe_lat = 8.5, 47.0
    if "nsper" in str(code_or_proj4) or "omerc" in str(code_or_proj4):
        probe_lon, probe_lat = 115.5, 5.0
    if "nsper" in str(code_or_proj4):
        probe_lon = 141.0
    x1, y1 = fwd(np.float64(probe_lon), np.float64(probe_lat), np)
    for rebuilt in (CRS.from_wkt(crs.to_wkt()), CRS.from_cf(crs.to_cf())):
        f2, _ = rebuilt.projection()
        x2, y2 = f2(np.float64(probe_lon), np.float64(probe_lat), np)
        assert abs(x1 - x2) < 1e-6 and abs(y1 - y2) < 1e-6


def test_geostationary_wkt_round_trip_keeps_sweep():
    """The sweep axis survives the WKT round trip (it rides in the method
    name; WKT parameters are numeric-only)."""
    crs = CRS.from_string(
        "+proj=geos +h=35785831 +lon_0=9.5 +sweep=x +ellps=GRS80"
    )
    rebuilt = CRS.from_wkt(crs.to_wkt())
    f1, _ = crs.projection()
    f2, _ = rebuilt.projection()
    x1, y1 = f1(np.float64(20.0), np.float64(30.0), np)
    x2, y2 = f2(np.float64(20.0), np.float64(30.0), np)
    assert abs(x1 - x2) < 1e-6 and abs(y1 - y2) < 1e-6


# -- round-4 registry additions (UPS, Belgian Lambert 72, ESRI world) --------


def test_ups_north_epsg_guidance_example():
    """EPSG Guidance Note 7-2 UPS example: 73N 44E -> E 3320416.75,
    N 632668.43 (EPSG:5041, variant A, k0=0.994)."""
    t = Transformer.from_crs(CRS.from_epsg(4326), CRS.from_epsg(5041),
                             always_xy=True)
    x, y = t.transform(np.float64(44.0), np.float64(73.0))
    assert abs(x - 3320416.75) < 0.01
    assert abs(y - 632668.43) < 0.01
    # the pole is the false origin
    x0, y0 = t.transform(np.float64(0.0), np.float64(90.0))
    assert abs(x0 - 2000000.0) < 1e-6 and abs(y0 - 2000000.0) < 1e-6


def test_ups_south_mirror_and_aliases():
    t = Transformer.from_crs(CRS.from_epsg(4326), CRS.from_epsg(5042),
                             always_xy=True)
    x, y = t.transform(np.float64(44.0), np.float64(-73.0))
    assert abs(x - 3320416.75) < 0.01
    assert abs(y - 3367331.57) < 0.01
    # 32661/32761 are the legacy UPS codes with swapped axis *names*;
    # the projection itself is identical
    for legacy, modern in ((32661, 5041), (32761, 5042)):
        f1, _ = CRS.from_epsg(legacy).projection()
        f2, _ = CRS.from_epsg(modern).projection()
        x1, y1 = f1(np.float64(20.0), np.float64(75.0 if legacy == 32661 else -75.0), np)
        x2, y2 = f2(np.float64(20.0), np.float64(75.0 if legacy == 32661 else -75.0), np)
        assert x1 == x2 and y1 == y2


def test_belgian_lambert_72():
    bel = CRS.from_epsg(31370)
    # projection origin invariants (datum-free): lat0=90 at lon0 lands on
    # the false origin exactly (rho0 = 0 for the secant cone)
    fwd, inv = bel.projection()
    x0, y0 = fwd(np.float64(4.367486666666666), np.float64(90.0), np)
    assert abs(x0 - 150000.013) < 1e-6
    assert abs(y0 - 5400088.438) < 1e-6
    # true to scale at both standard parallels (finite-difference scale)
    for sp in (51.16666723333333, 49.8333339):
        d = 1e-6
        x1, y1 = fwd(np.float64(4.0), np.float64(sp), np)
        x2, y2 = fwd(np.float64(4.0 + d), np.float64(sp), np)
        ell = bel.ellipsoid
        phi = np.radians(sp)
        nu = ell.a / np.sqrt(1 - ell.e2 * np.sin(phi) ** 2)
        expected = nu * np.cos(phi) * np.radians(d)
        k = np.hypot(x2 - x1, y2 - y1) / expected
        assert abs(k - 1.0) < 1e-7
    # Brussels, via the BD72 datum shift (EPSG:15929): published value
    # ~ (148853, 170705) for the Grand-Place
    t = Transformer.from_crs(CRS.from_epsg(4326), bel, always_xy=True)
    x, y = t.transform(np.float64(4.35247), np.float64(50.84673))
    assert abs(x - 148853.0) < 5.0
    assert abs(y - 170705.0) < 5.0
    # round trip
    ti = Transformer.from_crs(bel, CRS.from_epsg(4326), always_xy=True)
    lon, lat = ti.transform(x, y)
    # ~4e-9 deg residual: the conformal-latitude series inside the datum
    # round trip, well under a millimetre
    assert abs(lon - 4.35247) < 1e-7 and abs(lat - 50.84673) < 1e-7


def test_esri_world_codes():
    # Mollweide: x(lam, 0) = 2 sqrt(2)/pi * a * lam, spherical on a
    mol = CRS.from_user_input("ESRI:54009")
    fwd, inv = mol.projection()
    x, y = fwd(np.float64(90.0), np.float64(0.0), np)
    assert abs(x - np.sqrt(2.0) * 6378137.0) < 1e-3
    assert abs(y) < 1e-9
    lon, lat = inv(x, y, np)
    assert abs(lon - 90.0) < 1e-9 and abs(lat) < 1e-9
    # every registered ESRI world code resolves and round-trips
    for code in (54004, 54008, 54009, 54032, 54034):
        crs = CRS.from_authority("ESRI", code)
        fwd, inv = crs.projection()
        x, y = fwd(np.float64(12.5), np.float64(-33.0), np)
        lon, lat = inv(x, y, np)
        assert abs(lon - 12.5) < 1e-6 and abs(lat + 33.0) < 1e-6, crs.name


def test_from_authority_and_errors():
    assert CRS.from_authority("EPSG", 4326) is CRS.from_epsg(4326)
    assert CRS.from_authority("OGC", "CRS84").name.startswith("WGS 84")
    with pytest.raises(CRSError, match="unsupported EPSG code 99999"):
        CRS.from_epsg(99999)
    with pytest.raises(CRSError, match="unsupported ESRI code 54001"):
        CRS.from_esri(54001)
    with pytest.raises(CRSError, match="authority"):
        CRS.from_authority("IAU", 1000)
    # the EPSG error names the projection families the front door accepts
    try:
        CRS.from_epsg(99999)
    except CRSError as e:
        assert "transverse_mercator" in str(e)
        assert "mollweide" in str(e)
