"""GridMapping base behaviour (port of reference tests/gridmapping/test_base.py)."""

import numpy as np
import pytest

from xcube_resampling_tpu.crs import CRS
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.gridmapping.coords import Coords2DGridMapping
from xcube_resampling_tpu.gridmapping.helpers import Affine
from xcube_resampling_tpu.gridmapping.regular import RegularGridMapping
from xcube_resampling_tpu.xrlite import DataArray

GEO_CRS = CRS.from_epsg(4326)
NOT_A_GEO_CRS = CRS.from_epsg(5243)


class _TestGridMapping(GridMapping):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.rgm = GridMapping.regular(
            size=self.size,
            tile_size=self.tile_size,
            is_j_axis_up=self.is_j_axis_up,
            xy_res=self.xy_res,
            xy_min=(self.xy_bbox[0], self.xy_bbox[1]),
            crs=self.crs,
        )

    def _new_x_coords(self) -> DataArray:
        return self.rgm.x_coords

    def _new_y_coords(self) -> DataArray:
        return self.rgm.y_coords

    def _new_xy_coords(self) -> DataArray:
        return self.rgm.xy_coords


BASE_KWARGS = dict(
    size=(720, 360),
    tile_size=(360, 180),
    xy_bbox=(-180.0, -90.0, 180.0, 90.0),
    xy_res=(360 / 720, 360 / 720),
    crs=GEO_CRS,
    xy_var_names=("x", "y"),
    xy_dim_names=("x", "y"),
    is_regular=True,
    is_lon_360=False,
    is_j_axis_up=False,
)


def kwargs(**overrides):
    out = dict(BASE_KWARGS)
    out.update(**overrides)
    if "xy_min" in out:
        width, height = out["size"]
        try:
            x_res, y_res = out["xy_res"]
        except TypeError:
            x_res, y_res = 2 * (out["xy_res"],)
        x_min, y_min = out.pop("xy_min")
        out["xy_bbox"] = x_min, y_min, x_min + x_res * width, y_min + y_res * height
    return out


def assert_matrix_point(expected_point, matrix, point):
    affine_matrix = Affine(*matrix[0], *matrix[1])
    actual = affine_matrix * point
    assert actual[0] == pytest.approx(expected_point[0])
    assert actual[1] == pytest.approx(expected_point[1])


def test_valid():
    gm = _TestGridMapping(**kwargs())
    assert (720, 360) == gm.size
    assert 720 == gm.width
    assert 360 == gm.height
    assert gm.is_tiled
    assert (360, 180) == gm.tile_size
    assert 360 == gm.tile_width
    assert 180 == gm.tile_height
    assert (0, 0, 720, 360) == gm.ij_bbox
    assert (-180.0, -90.0, 180.0, 90.0) == gm.xy_bbox
    assert -180.0 == gm.x_min
    assert -90.0 == gm.y_min
    assert 180.0 == gm.x_max
    assert 90.0 == gm.y_max
    assert (0.5, 0.5) == gm.xy_res
    assert 0.5 == gm.x_res
    assert 0.5 == gm.y_res
    assert GEO_CRS == gm.crs
    assert "degree" == gm.spatial_unit_name
    assert gm.is_regular is True
    assert gm.is_lon_360 is False
    assert gm.is_j_axis_up is False

    assert isinstance(gm.xy_coords, DataArray)
    np.testing.assert_equal(
        np.array(
            [
                [0, 0, 360, 180],
                [360, 0, 720, 180],
                [0, 180, 360, 360],
                [360, 180, 720, 360],
            ]
        ),
        gm.ij_bboxes,
    )
    np.testing.assert_equal(
        np.array(
            [
                [-180.0, 0.0, 0.0, 90.0],
                [0.0, 0.0, 180.0, 90.0],
                [-180.0, -90.0, 0.0, 0.0],
                [0.0, -90.0, 180.0, 0.0],
            ]
        ),
        gm.xy_bboxes,
    )


def test_invalids():
    with pytest.raises(ValueError, match="invalid size"):
        _TestGridMapping(**kwargs(size=(360, 1)))

    with pytest.raises(ValueError, match="not enough values to unpack"):
        _TestGridMapping(**kwargs(size=(360,)))

    with pytest.raises(
        ValueError, match="size must be an int or a sequence of two ints"
    ):
        _TestGridMapping(**kwargs(size=None))

    with pytest.raises(ValueError, match="invalid tile_size"):
        _TestGridMapping(**kwargs(tile_size=0))

    with pytest.raises(ValueError, match="invalid xy_res"):
        _TestGridMapping(**kwargs(xy_res=-0.1))


def test_scalars():
    gm = _TestGridMapping(**kwargs(size=360, tile_size=180, xy_res=0.1))
    assert (360, 360) == gm.size
    assert (180, 180) == gm.tile_size
    assert (0.1, 0.1) == gm.xy_res


def test_not_tiled():
    gm = _TestGridMapping(**kwargs(tile_size=None))
    assert (720, 360) == gm.tile_size
    assert not gm.is_tiled


def test_ij_to_xy_transform():
    image_geom = _TestGridMapping(
        **kwargs(size=(1200, 1200), xy_min=(0, 0), xy_res=1, crs=NOT_A_GEO_CRS)
    )
    i2crs = image_geom.ij_to_xy_transform
    assert_matrix_point((0, 0), i2crs, (0, 1200))
    assert_matrix_point((1024, 0), i2crs, (1024, 1200))
    assert_matrix_point((0, 1024), i2crs, (0, 1200 - 1024))
    assert_matrix_point((1024, 1024), i2crs, (1024, 1200 - 1024))
    assert ((1, 0, 0), (0.0, -1, 1200)) == i2crs

    image_geom = _TestGridMapping(
        **kwargs(size=(1440, 720), xy_min=(-180, -90), xy_res=0.25)
    )
    i2crs = image_geom.ij_to_xy_transform
    assert_matrix_point((-180, 90), i2crs, (0, 0))
    assert_matrix_point((0, 0), i2crs, (720, 360))
    assert_matrix_point((180, -90), i2crs, (1440, 720))
    assert ((0.25, 0.0, -180.0), (0.0, -0.25, 90.0)) == i2crs

    image_geom = _TestGridMapping(
        **kwargs(size=(1440, 720), xy_min=(-180, -90), xy_res=0.25, is_j_axis_up=True)
    )
    i2crs = image_geom.ij_to_xy_transform
    assert_matrix_point((-180, -90), i2crs, (0, 0))
    assert_matrix_point((0, 0), i2crs, (720, 360))
    assert_matrix_point((180, 90), i2crs, (1440, 720))
    assert ((0.25, 0.0, -180.0), (0.0, 0.25, -90.0)) == i2crs


def test_xy_to_ij_transform():
    image_geom = _TestGridMapping(
        **kwargs(size=(1200, 1200), xy_min=(0, 0), xy_res=1, crs=NOT_A_GEO_CRS)
    )
    crs2i = image_geom.xy_to_ij_transform
    assert_matrix_point((0, 0), crs2i, (0, 1200))
    assert_matrix_point((1024, 0), crs2i, (1024, 1200))
    assert_matrix_point((0, 1024), crs2i, (0, 1200 - 1024))
    assert_matrix_point((1024, 1024), crs2i, (1024, 1200 - 1024))
    assert ((1, 0, 0), (0.0, -1, 1200)) == crs2i

    image_geom = _TestGridMapping(**kwargs(size=(1440, 720), xy_res=0.25))
    crs2i = image_geom.xy_to_ij_transform
    assert_matrix_point((0, 720), crs2i, (-180, -90))
    assert_matrix_point((720, 360), crs2i, (0, 0))
    assert_matrix_point((1440, 0), crs2i, (180, 90))
    assert ((4.0, 0.0, 720.0), (0.0, -4.0, 360.0)) == crs2i

    image_geom = _TestGridMapping(
        **kwargs(size=(1440, 720), xy_res=0.25, is_j_axis_up=True)
    )
    crs2i = image_geom.xy_to_ij_transform
    assert_matrix_point((0, 0), crs2i, (-180, -90))
    assert_matrix_point((720, 360), crs2i, (0, 0))
    assert_matrix_point((1440, 720), crs2i, (180, 90))
    assert ((4.0, 0.0, 720.0), (0.0, 4.0, 360.0)) == crs2i


def test_ij_transform_to_and_from():
    gm1 = _TestGridMapping(**kwargs(size=(1440, 720), xy_res=0.25, is_j_axis_up=True))
    gm2 = _TestGridMapping(
        **kwargs(size=(1000, 1000), xy_min=(10, 50), xy_res=0.025, is_j_axis_up=True)
    )
    assert ((10.0, 0.0, -7600.0), (0.0, 10.0, -5600.0)) == gm1.ij_transform_to(gm2)
    assert ((10.0, 0.0, -7600.0), (0.0, 10.0, -5600.0)) == gm2.ij_transform_from(gm1)
    assert ((0.1, 0.0, 760.0), (0.0, 0.1, 560.0)) == gm2.ij_transform_to(gm1)
    assert ((0.1, 0.0, 760.0), (0.0, 0.1, 560.0)) == gm1.ij_transform_from(gm2)


def test_derive():
    gm = _TestGridMapping(**kwargs())
    assert (720, 360) == gm.size
    assert (360, 180) == gm.tile_size
    assert gm.is_j_axis_up is False

    # force creation of xy_coords array and save value
    xy_coords = gm.xy_coords

    derived_gm = gm.derive(
        tile_size=270,
        is_j_axis_up=True,
        xy_var_names=("u", "v"),
        xy_dim_names=("i", "j"),
    )

    assert derived_gm is not gm
    assert isinstance(derived_gm, _TestGridMapping)
    assert (720, 360) == derived_gm.size
    assert (270, 270) == derived_gm.tile_size
    assert derived_gm.is_j_axis_up is True
    assert ("u", "v") == derived_gm.xy_var_names
    assert ("i", "j") == derived_gm.xy_dim_names

    derived_xy_coords = derived_gm.xy_coords
    assert derived_xy_coords is not xy_coords
    assert ((2,), (270, 90), (270, 270, 180)) == derived_xy_coords.chunks


def test_scale():
    gm = _TestGridMapping(**kwargs())
    xy_coords = gm.xy_coords

    scaled_gm = gm.scale((0.25, 0.5))
    assert scaled_gm is not gm
    assert isinstance(scaled_gm, RegularGridMapping)
    assert (180, 180) == scaled_gm.size
    assert (180, 180) == scaled_gm.tile_size
    assert scaled_gm.is_j_axis_up is False
    assert ("x", "y") == scaled_gm.xy_var_names
    assert ("x", "y") == scaled_gm.xy_dim_names

    scaled_xy_coords = scaled_gm.xy_coords
    assert scaled_xy_coords is not xy_coords
    assert ((2,), (180,), (180,)) == scaled_xy_coords.chunks

    scaled_gm = gm.scale((0.25, 0.5), tile_size=(90, 90))
    assert (180, 180) == scaled_gm.size
    assert (90, 90) == scaled_gm.tile_size
    scaled_xy_coords = scaled_gm.xy_coords
    assert ((2,), (90, 90), (90, 90)) == scaled_xy_coords.chunks


def test_transform():
    gm = _TestGridMapping(
        **kwargs(
            xy_min=(20, 56), size=(400, 200), tile_size=(400, 200), xy_res=(0.01, 0.01)
        )
    )
    transformed_gm = gm.transform("EPSG:32633")

    assert transformed_gm is not gm
    assert isinstance(transformed_gm, Coords2DGridMapping)
    assert CRS.from_string("EPSG:32633") == transformed_gm.crs
    assert (400, 200) == transformed_gm.size
    assert (400, 200) == transformed_gm.tile_size
    assert transformed_gm.is_j_axis_up is False
    assert ("transformed_x", "transformed_y") == transformed_gm.xy_var_names
    assert ("lon", "lat") == transformed_gm.xy_dim_names


def test_transform_xy_res():
    gm = _TestGridMapping(
        **kwargs(
            xy_min=(20, 56), size=(400, 200), tile_size=(200, 200), xy_res=(0.01, 0.01)
        )
    )
    transformed_gm = gm.transform("EPSG:32633", xy_res=1000)

    assert isinstance(transformed_gm, Coords2DGridMapping)
    assert CRS.from_string("EPSG:32633") == transformed_gm.crs
    assert (400, 200) == transformed_gm.size
    assert (200, 200) == transformed_gm.tile_size
    assert (1000, 1000) == transformed_gm.xy_res
    assert transformed_gm.is_j_axis_up is False
    assert ("transformed_x", "transformed_y") == transformed_gm.xy_var_names
    assert ("lon", "lat") == transformed_gm.xy_dim_names

    transformed_gm_regular = transformed_gm.to_regular()
    assert isinstance(transformed_gm_regular, RegularGridMapping)
    assert CRS.from_string("EPSG:32633") == transformed_gm_regular.crs
    assert (267, 249) == transformed_gm_regular.size
    assert (200, 200) == transformed_gm_regular.tile_size
    assert (1000, 1000) == transformed_gm_regular.xy_res
    assert transformed_gm_regular.is_j_axis_up is False
    assert ("x", "y") == transformed_gm_regular.xy_var_names
    assert ("x", "y") == transformed_gm_regular.xy_dim_names


@pytest.mark.slow
def test_to_regular():
    gm = _TestGridMapping(
        **kwargs(
            xy_min=(9.6, 47.6),
            size=(1000, 1000),
            tile_size=(1000, 1000),
            xy_res=(0.0002, 0.0002),
        )
    )
    transformed_gm = gm.transform("EPSG:32633")
    transformed_gm_regular = transformed_gm.to_regular()

    assert isinstance(transformed_gm_regular, RegularGridMapping)
    assert CRS.from_string("EPSG:32633") == transformed_gm_regular.crs
    assert (827, 1163) == transformed_gm_regular.size
    assert (1000, 1000) == transformed_gm_regular.tile_size
    assert transformed_gm_regular.is_j_axis_up is False
    assert transformed_gm_regular.is_lon_360 is False


def test_is_close():
    gm1 = _TestGridMapping(
        **kwargs(xy_min=(0, 0), size=(400, 200), xy_res=(0.01, 0.01))
    )
    gm2 = _TestGridMapping(
        **kwargs(xy_min=(0, 0), size=(400, 200), xy_res=(0.01, 0.01))
    )
    assert gm1.is_close(gm1)
    assert gm1.is_close(gm2)
    assert gm2.is_close(gm1)

    tolerance = 0.001

    gm2 = _TestGridMapping(
        **kwargs(
            xy_min=(tolerance / 2, tolerance / 2), size=(400, 200), xy_res=(0.01, 0.01)
        )
    )
    assert gm1.is_close(gm2, tolerance=tolerance)
    assert gm2.is_close(gm1, tolerance=tolerance)

    gm2 = _TestGridMapping(
        **kwargs(
            tile_size=(360, 180),
            xy_min=(tolerance * 2, tolerance * 2),
            size=(400, 200),
            xy_res=(0.01, 0.01),
        )
    )
    assert not gm1.is_close(gm2, tolerance=tolerance)
    assert not gm2.is_close(gm1, tolerance=tolerance)


def test_is_regular_raise_error():
    gm = _TestGridMapping(**kwargs(is_regular=False))
    with pytest.raises(ValueError, match="must be a regular grid mapping"):
        GridMapping.assert_regular(gm)

    with pytest.raises(
        NotImplementedError,
        match="Operation not implemented for non-regular grid mappings",
    ):
        gm._assert_regular()


def test_ij_bbox_from_xy_bbox():
    gm = _TestGridMapping(**kwargs())

    assert (0, 0, 720, 360) == gm.ij_bbox_from_xy_bbox((-180, -90, 180, 90))
    assert (0, 180, 360, 360) == gm.ij_bbox_from_xy_bbox((-180, -90, 0, 0))
    assert (360, 0, 720, 180) == gm.ij_bbox_from_xy_bbox((0, 0, 180, 90))
    assert (0, 179, 361, 360) == gm.ij_bbox_from_xy_bbox(
        (-180, -90, 0, 0), ij_border=1
    )
    assert (359, 0, 720, 181) == gm.ij_bbox_from_xy_bbox((0, 0, 180, 90), ij_border=1)
    assert (0, 339, 21, 360) == gm.ij_bbox_from_xy_bbox(
        (-190, -100, -170, -80), ij_border=1
    )
    assert (-1, -1, -1, -1) == gm.ij_bbox_from_xy_bbox(
        (-190, -100, -180, -90), ij_border=1
    )


def test_ij_bboxes_from_xy_bboxes():
    gm = _TestGridMapping(**kwargs())

    ij_bboxes = gm.ij_bboxes_from_xy_bboxes(
        xy_bboxes=np.array(
            [
                [-180, -90, 180, 90],
                [-180, -90, 0, 0],
                [0, 0, 180, 90],
                [-180, -90, 0, 0],
                [0, 0, 180, 90],
                [-190, -100, -170, -80],
                [-190, -100, -180, -90],
            ],
            dtype=np.float32,
        )
    )

    np.testing.assert_equal(
        ij_bboxes,
        np.array(
            [
                [0, 0, 720, 360],
                [0, 180, 360, 360],
                [360, 0, 720, 180],
                [0, 180, 360, 360],
                [360, 0, 720, 180],
                [0, 340, 20, 360],
                [-1, -1, -1, -1],
            ],
            dtype=np.int64,
        ),
    )


def test_repr_markdown():
    gm = _TestGridMapping(**kwargs())
    md = gm._repr_markdown_()

    assert "class: **_TestGridMapping**" in md
    assert "* is_regular: True" in md
    assert "* is_j_axis_up: False" in md
    assert "* is_lon_360: False" in md
    assert "* crs: EPSG:4326" in md
    assert "* xy_res: (0.5, 0.5)" in md
