"""WKT1/WKT2/proj4 parsing and datum transforms (crs/wkt.py, crs/proj4.py,
crs/datum.py Helmert pipeline).

Golden WKT strings below are captured pyproj/GDAL output styles (the
reference accepts them via pyproj.CRS.from_user_input — reference
gridmapping/cfconv.py:215-252, base.py:49-52)."""

import logging
import math

import numpy as np
import pytest

from xcube_resampling_tpu.crs import CRS, Transformer
from xcube_resampling_tpu.crs.core import CRSError

REGISTRY_CODES = [
    4326, 4258, 4269, 4230, 4277, 4301, 4267, 3035, 3857, 3395, 3031,
    3413, 2154, 6933, 3034, 5243, 27700, 32632, 32732, 25832, 23032,
]


@pytest.mark.parametrize("code", REGISTRY_CODES)
def test_wkt_self_round_trip(code):
    crs = CRS.from_epsg(code)
    assert CRS.from_wkt(crs.to_wkt()) == crs


PYPROJ_WKT2_32632 = """PROJCRS["WGS 84 / UTM zone 32N",
    BASEGEOGCRS["WGS 84",
        ENSEMBLE["World Geodetic System 1984 ensemble",
            MEMBER["World Geodetic System 1984 (Transit)"],
            MEMBER["World Geodetic System 1984 (G2296)"],
            ELLIPSOID["WGS 84",6378137,298.257223563,
                LENGTHUNIT["metre",1]],
            ENSEMBLEACCURACY[2.0]],
        PRIMEM["Greenwich",0,
            ANGLEUNIT["degree",0.0174532925199433]],
        ID["EPSG",4326]],
    CONVERSION["UTM zone 32N",
        METHOD["Transverse Mercator",
            ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,
            ANGLEUNIT["degree",0.0174532925199433],
            ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",9,
            ANGLEUNIT["degree",0.0174532925199433],
            ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9996,
            SCALEUNIT["unity",1],
            ID["EPSG",8805]],
        PARAMETER["False easting",500000,
            LENGTHUNIT["metre",1],
            ID["EPSG",8806]],
        PARAMETER["False northing",0,
            LENGTHUNIT["metre",1],
            ID["EPSG",8807]]],
    CS[Cartesian,2],
        AXIS["(E)",east, ORDER[1], LENGTHUNIT["metre",1]],
        AXIS["(N)",north, ORDER[2], LENGTHUNIT["metre",1]],
    USAGE[
        SCOPE["Navigation and medium accuracy spatial referencing."],
        AREA["Between 6degE and 12degE, northern hemisphere."],
        BBOX[0,6,84,12]],
    ID["EPSG",32632]]"""


def test_pyproj_wkt2_with_ensemble_and_usage():
    crs = CRS.from_wkt(PYPROJ_WKT2_32632)
    assert crs == CRS.from_epsg(32632)
    assert crs.to_epsg() == 32632


def test_wkt2_without_epsg_id_builds_from_parameters():
    # strip the EPSG ids so the registry shortcut cannot fire
    wkt = PYPROJ_WKT2_32632.replace(',\n    ID["EPSG",32632]]', "]")
    wkt = wkt.replace('ID["EPSG",4326]', 'ID["OTHER",1]').replace(
        'ID["EPSG",9807]', 'ID["OTHER",1]'
    )
    assert 'ID["EPSG",32632]' not in wkt
    crs = CRS.from_wkt(wkt)
    assert crs.is_projected
    assert crs.proj_name == "transverse_mercator"
    assert crs == CRS.from_epsg(32632)  # parameter-identified


GDAL_WKT1_32632 = """PROJCS["WGS 84 / UTM zone 32N",
    GEOGCS["WGS 84",
        DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563,
                AUTHORITY["EPSG","7030"]],
            AUTHORITY["EPSG","6326"]],
        PRIMEM["Greenwich",0, AUTHORITY["EPSG","8901"]],
        UNIT["degree",0.0174532925199433, AUTHORITY["EPSG","9122"]]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",0],
    PARAMETER["central_meridian",9],
    PARAMETER["scale_factor",0.9996],
    PARAMETER["false_easting",500000],
    PARAMETER["false_northing",0],
    UNIT["metre",1, AUTHORITY["EPSG","9001"]],
    AXIS["Easting",EAST], AXIS["Northing",NORTH]]"""


def test_gdal_wkt1():
    crs = CRS.from_wkt(GDAL_WKT1_32632)
    assert crs == CRS.from_epsg(32632)


def test_wkt1_geographic_with_towgs84():
    wkt = """GEOGCS["ED50",
        DATUM["European_Datum_1950",
            SPHEROID["International 1924",6378388,297],
            TOWGS84[-87,-98,-121,0,0,0,0]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]]"""
    from xcube_resampling_tpu.crs.transformer import _effective_towgs84

    crs = CRS.from_wkt(wkt)
    assert crs.is_geographic
    # the explicit TOWGS84 equals the registry's ED50 parameters, so it
    # normalizes into the datum-name lookup
    assert _effective_towgs84(crs) == (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)
    assert abs(crs.ellipsoid.a - 6378388) < 1e-6


def test_wkt1_lcc_2sp():
    wkt = """PROJCS["ETRS89-extended / LAEA Europe style LCC",
        GEOGCS["ETRS89", DATUM["European_Terrestrial_Reference_System_1989",
            SPHEROID["GRS 1980",6378137,298.257222101]],
            PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
        PROJECTION["Lambert_Conformal_Conic_2SP"],
        PARAMETER["standard_parallel_1",35],
        PARAMETER["standard_parallel_2",65],
        PARAMETER["latitude_of_origin",52],
        PARAMETER["central_meridian",10],
        PARAMETER["false_easting",4000000],
        PARAMETER["false_northing",2800000],
        UNIT["metre",1]]"""
    crs = CRS.from_wkt(wkt)
    assert crs == CRS.from_epsg(3034)


def test_wkt_unsupported_method_raises():
    wkt = """PROJCS["x", GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
        PROJECTION["Van_der_Grinten"],
        PARAMETER["central_meridian",0], UNIT["metre",1]]"""
    with pytest.raises(CRSError, match="[Vv]an"):
        CRS.from_wkt(wkt)


def test_wkt_azimuthal_equidistant_parses():
    """aeqd joined the supported families in round 3; the WKT front door
    must now accept it rather than raise."""
    wkt = """PROJCS["x", GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
        PROJECTION["Azimuthal_Equidistant"],
        PARAMETER["central_meridian",0], UNIT["metre",1]]"""
    crs = CRS.from_wkt(wkt)
    assert crs.is_projected
    fwd, inv = crs.projection()
    import numpy as _np

    x, y = fwd(_np.float64(10.0), _np.float64(20.0), _np)
    lon, lat = inv(x, y, _np)
    assert abs(lon - 10.0) < 1e-8 and abs(lat - 20.0) < 1e-8


def test_wkt_orthographic_parses():
    """Orthographic joined the supported families in round 3; the WKT
    front door must now accept it rather than raise."""
    wkt = """PROJCS["x", GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
        PROJECTION["Orthographic"],
        PARAMETER["latitude_of_origin",40],
        PARAMETER["central_meridian",-75], UNIT["metre",1]]"""
    crs = CRS.from_wkt(wkt)
    assert crs.is_projected


def test_from_cf_full_wkt_without_epsg_id():
    """A dataset whose crs_wkt carries full WKT with no recognizable EPSG
    id must still resolve (VERDICT r1 missing #1)."""
    wkt = GDAL_WKT1_32632.replace('AUTHORITY["EPSG","7030"]', 'X["y",1]')
    crs = CRS.from_cf({"crs_wkt": wkt})
    assert crs == CRS.from_epsg(32632)


# ---------------------------------------------------------------------------
# proj4
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,code",
    [
        ("+proj=utm +zone=32 +datum=WGS84 +units=m +no_defs", 32632),
        ("+proj=utm +zone=32 +south +datum=WGS84", 32732),
        (
            "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
            "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs",
            3035,
        ),
        ("+proj=longlat +datum=WGS84 +no_defs", None),
        ("+init=epsg:32632", 32632),
    ],
)
def test_proj4_forms(text, code):
    crs = CRS.from_string(text)
    if code is not None:
        assert crs == CRS.from_epsg(code)
    else:
        assert crs.is_geographic


def test_proj4_tmerc_explicit():
    crs = CRS.from_proj4(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy +datum=OSGB36"
    )
    assert crs == CRS.from_epsg(27700)


def test_proj4_unsupported_raises():
    with pytest.raises(CRSError):
        CRS.from_proj4("+proj=vandg +lon_0=0")


def test_urn_form():
    assert CRS.from_string("urn:ogc:def:crs:EPSG::4326") == CRS.from_epsg(4326)


# ---------------------------------------------------------------------------
# datum transforms
# ---------------------------------------------------------------------------


def test_ed50_wgs84_shift_magnitude_and_round_trip():
    t = Transformer.from_crs("EPSG:4230", "EPSG:4326")
    lon, lat = t.transform(10.0, 52.0)
    dx = (lon - 10.0) * 111320 * math.cos(math.radians(52))
    dy = (lat - 52.0) * 110574
    # ED50->WGS84 in central Europe is ~100-150 m total
    assert 50 < math.hypot(dx, dy) < 300
    back = Transformer.from_crs("EPSG:4326", "EPSG:4230")
    lon2, lat2 = back.transform(lon, lat)
    # h=0 is re-imposed each way; residual stays < 1 cm
    assert abs(lon2 - 10.0) < 1e-7 and abs(lat2 - 52.0) < 1e-7


def test_osgb_bng_point():
    """Greenwich Observatory via the OSGB36 Helmert (single-transform
    accuracy is a few metres vs the OSTN15 grid truth)."""
    t = Transformer.from_crs("EPSG:4326", "EPSG:27700")
    e, n = t.transform(-0.0014, 51.4779)
    assert abs(e - 538885) < 100
    assert abs(n - 177330) < 100


def test_coincident_modern_datums_stay_identity():
    t = Transformer.from_crs("EPSG:4258", "EPSG:4326")  # ETRS89 -> WGS84
    lon, lat = t.transform(10.0, 52.0)
    assert lon == 10.0 and lat == 52.0


def test_unknown_datum_pair_warns_once(caplog):
    crs_u = CRS.from_string("+proj=longlat +ellps=krass")
    with caplog.at_level(logging.WARNING, logger="xcube.resampling"):
        t = Transformer.from_crs(crs_u, "EPSG:4326")
        lon, lat = t.transform(10.0, 52.0)
    assert any("coincident" in r.message for r in caplog.records)
    # treated as coincident: passthrough of the geographic hub
    assert lon == 10.0 and lat == 52.0


def test_projected_cross_datum_transform_is_consistent():
    """ED50/UTM32 -> WGS84/UTM32 should shift by the ED50 offset, and a
    32-bit array path must agree with scalars."""
    t = Transformer.from_crs("EPSG:23032", "EPSG:32632")
    e, n = t.transform(500000.0, 5760000.0)
    assert 40 < abs(e - 500000.0) + abs(n - 5760000.0) < 400
    ea, na = t.transform(np.full(4, 500000.0), np.full(4, 5760000.0))
    np.testing.assert_allclose(ea, e, rtol=0, atol=1e-6)
    np.testing.assert_allclose(na, n, rtol=0, atol=1e-6)


def test_datum_shift_traces_under_jit():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    t = Transformer.from_crs("EPSG:4230", "EPSG:4326")
    fn = t.transform_fn()

    @jax.jit
    def run(x, y):
        return fn(x, y, jnp)

    lon, lat = run(jnp.asarray([10.0]), jnp.asarray([52.0]))
    ref_lon, ref_lat = t.transform(10.0, 52.0)
    assert abs(float(lon[0]) - ref_lon) < 1e-5
    assert abs(float(lat[0]) - ref_lat) < 1e-5


def test_boundcrs_wkt2():
    wkt = """BOUNDCRS[
        SOURCECRS[
            GEOGCRS["ED50",
                DATUM["European Datum 1950",
                    ELLIPSOID["International 1924",6378388,297,
                        LENGTHUNIT["metre",1]]],
                CS[ellipsoidal,2],
                AXIS["latitude",north], AXIS["longitude",east],
                ANGLEUNIT["degree",0.0174532925199433],
                ID["EPSG",4230]]],
        TARGETCRS[
            GEOGCRS["WGS 84",
                DATUM["World Geodetic System 1984",
                    ELLIPSOID["WGS 84",6378137,298.257223563]],
                CS[ellipsoidal,2],
                AXIS["latitude",north], AXIS["longitude",east],
                ANGLEUNIT["degree",0.0174532925199433]]],
        ABRIDGEDTRANSFORMATION["ED50 to WGS 84 (mean)",
            METHOD["Geocentric translations"],
            PARAMETER["X-axis translation",-87],
            PARAMETER["Y-axis translation",-98],
            PARAMETER["Z-axis translation",-121]]]"""
    from xcube_resampling_tpu.crs.transformer import _effective_towgs84

    crs = CRS.from_wkt(wkt)
    assert crs.is_geographic
    assert _effective_towgs84(crs) == (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)


def test_boundcrs_abridged_scale_difference_is_a_ratio():
    """WKT2 ABRIDGEDTRANSFORMATION expresses 'Scale difference' as the
    ratio 1 + ds*1e-6 (PROJ emits 0.999979511 for the OSGB36 -20.489 ppm);
    the parser must convert it back to ppm for the towgs84 slot."""
    wkt = """BOUNDCRS[
        SOURCECRS[
            GEOGCRS["OSGB36",
                DATUM["Ordnance Survey of Great Britain 1936",
                    ELLIPSOID["Airy 1830",6377563.396,299.3249646,
                        LENGTHUNIT["metre",1]]],
                CS[ellipsoidal,2],
                AXIS["latitude",north], AXIS["longitude",east],
                ANGLEUNIT["degree",0.0174532925199433]]],
        TARGETCRS[
            GEOGCRS["WGS 84",
                DATUM["World Geodetic System 1984",
                    ELLIPSOID["WGS 84",6378137,298.257223563]],
                CS[ellipsoidal,2],
                AXIS["latitude",north], AXIS["longitude",east],
                ANGLEUNIT["degree",0.0174532925199433]]],
        ABRIDGEDTRANSFORMATION["OSGB36 to WGS 84 (9)",
            METHOD["Position Vector transformation (geog2D domain)"],
            PARAMETER["X-axis translation",446.448],
            PARAMETER["Y-axis translation",-125.157],
            PARAMETER["Z-axis translation",542.06],
            PARAMETER["X-axis rotation",0.15],
            PARAMETER["Y-axis rotation",0.247],
            PARAMETER["Z-axis rotation",0.842],
            PARAMETER["Scale difference",0.999979511]]]"""
    crs = CRS.from_wkt(wkt)
    t = crs.towgs84
    assert t is not None
    np.testing.assert_allclose(
        t,
        (446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489),
        atol=1e-6,
    )


def test_truncated_crs_wkt_falls_back_to_cf_attrs():
    """A truncated crs_wkt attribute must not crash from_cf with a bare
    IndexError; the CF grid-mapping attributes take over (reference parity:
    pyproj-backed cfconv falls back the same way)."""
    crs = CRS.from_cf(
        {
            "crs_wkt": 'PROJCRS["broken", BASEGEOGCRS["WGS 84", DATUM[',
            "grid_mapping_name": "latitude_longitude",
            "semi_major_axis": 6378137.0,
            "inverse_flattening": 298.257223563,
        }
    )
    assert crs.is_geographic
