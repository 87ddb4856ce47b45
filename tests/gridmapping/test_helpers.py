"""Helpers behaviour (port of reference test_helpers.py)."""

from fractions import Fraction

import numpy as np
import pytest

from xcube_resampling_tpu.gridmapping.helpers import (
    _normalize_number_pair,
    _to_int_or_float,
    from_lon_360,
    round_to_fraction,
    to_lon_360,
)
from xcube_resampling_tpu.xrlite import DataArray


class TestRoundToFraction:
    def test_invalid(self):
        with pytest.raises(ValueError):
            round_to_fraction(0.29, digits=0)
        with pytest.raises(ValueError):
            round_to_fraction(0.29, resolution=0)
        with pytest.raises(ValueError):
            round_to_fraction(0.29, resolution=0.12)

    def test_1_025(self):
        def f(value):
            return float(round_to_fraction(value, 1, 0.25))

        assert f(-1) == pytest.approx(-1.0)
        assert f(0) == pytest.approx(0.0)
        assert f(1) == pytest.approx(1.0)
        assert f(1.2) == pytest.approx(1.25)
        assert f(1.3) == pytest.approx(1.25)
        assert f(1.4) == pytest.approx(1.5)
        assert f(1.45) == pytest.approx(1.5)
        assert f(1.51) == pytest.approx(1.5)
        assert f(1.7) == pytest.approx(1.75)
        assert f(1.9) == pytest.approx(2.0)
        assert f(1.96) == pytest.approx(2.0)
        assert f(1.98) == pytest.approx(2.0)
        assert f(2) == pytest.approx(2.0)

    def test_2_025(self):
        def f(value):
            return float(round_to_fraction(value, 2, 0.25))

        assert f(1.2) == pytest.approx(1.2)
        assert f(1.23) == pytest.approx(1.225)
        assert f(1.3) == pytest.approx(1.3)
        assert f(1.45) == pytest.approx(1.45)
        assert f(1.51) == pytest.approx(1.5)
        assert f(1.79) == pytest.approx(1.8)
        assert f(1.96) == pytest.approx(1.95)
        assert f(1.98) == pytest.approx(1.975)
        assert f(2) == pytest.approx(2.0)

    def _assert_values(self, values, kwargs):
        for value, expected_float, expected_fraction in values:
            actual_fraction = round_to_fraction(value, **kwargs)
            assert expected_fraction == actual_fraction
            assert float(actual_fraction) == pytest.approx(expected_float)

    def test_default(self):
        values = [
            [-1.0, -1.0, Fraction(-1, 1)],
            [0.0, 0.0, Fraction(0, 1)],
            [5.247476065426347e-09, 5.2e-09, Fraction(13, 2500000000)],
            [3.427467229408875e-06, 3.4e-06, Fraction(17, 5000000)],
            [4.501758583626108e-06, 4.5e-06, Fraction(9, 2000000)],
            [1.1351705264714663e-05, 1.1e-05, Fraction(11, 1000000)],
            [0.00048171747406886744, 0.00048, Fraction(3, 6250)],
            [0.0018032657496927416, 0.0018, Fraction(9, 5000)],
            [0.0019897341919324425, 0.002, Fraction(1, 500)],
            [0.0041643509375105065, 0.0042, Fraction(21, 5000)],
            [0.030607346091352187, 0.031, Fraction(31, 1000)],
            [1.0076973439575128, 1.0, Fraction(1, 1)],
            [1.0, 1.0, Fraction(1, 1)],
            [84.54360269093455, 85.0, Fraction(85, 1)],
            [494.86581234602096, 490.0, Fraction(490, 1)],
            [987.9441243998718, 990.0, Fraction(990, 1)],
            [1757.368043916636, 1800.0, Fraction(1800, 1)],
            [1143506.2928512183, 1100000.0, Fraction(1100000, 1)],
            [217971970.75235566, 220000000.0, Fraction(220000000, 1)],
        ]
        self._assert_values(values, dict())

    def test_3_025(self):
        assert Fraction(1, 1) == round_to_fraction(1, digits=1, resolution=0.25)
        values = [
            [5.247476065426347e-09, 5.2475e-09, Fraction(2099, 400000000000)],
            [3.427467229408875e-06, 3.4275e-06, Fraction(1371, 400000000)],
            [4.501758583626108e-06, 4.5025e-06, Fraction(1801, 400000000)],
            [1.1351705264714663e-05, 1.135e-05, Fraction(227, 20000000)],
            [0.00048171747406886744, 0.00048175, Fraction(1927, 4000000)],
            [0.0018032657496927416, 0.0018025, Fraction(721, 400000)],
            [0.0019897341919324425, 0.00199, Fraction(199, 100000)],
            [0.0041643509375105065, 0.004165, Fraction(833, 200000)],
            [0.030607346091352187, 0.0306, Fraction(153, 5000)],
            [1.0076973439575128, 1.0075, Fraction(403, 400)],
            [84.54360269093455, 84.55, Fraction(1691, 20)],
            [494.86581234602096, 494.75, Fraction(1979, 4)],
            [987.9441243998718, 988.0, Fraction(988, 1)],
            [1757.368043916636, 1757.5, Fraction(3515, 2)],
            [1143506.2928512183, 1142500.0, Fraction(1142500, 1)],
            [217971970.75235566, 218000000.0, Fraction(218000000, 1)],
        ]
        self._assert_values(values, dict(digits=3, resolution=0.25))

    def test_2_5(self):
        values = [
            [5.247476065426347e-09, 5.25e-09, Fraction(21, 4000000000)],
            [3.427467229408875e-06, 3.45e-06, Fraction(69, 20000000)],
            [4.501758583626108e-06, 4.5e-06, Fraction(9, 2000000)],
            [1.1351705264714663e-05, 1.15e-05, Fraction(23, 2000000)],
            [0.00048171747406886744, 0.00048, Fraction(3, 6250)],
            [0.0041643509375105065, 0.00415, Fraction(83, 20000)],
            [0.030607346091352187, 0.0305, Fraction(61, 2000)],
            [84.54360269093455, 84.5, Fraction(169, 2)],
            [494.86581234602096, 495.0, Fraction(495, 1)],
            [987.9441243998718, 990.0, Fraction(990, 1)],
            [1757.368043916636, 1750.0, Fraction(1750, 1)],
            [1143506.2928512183, 1150000.0, Fraction(1150000, 1)],
            [217971970.75235566, 220000000.0, Fraction(220000000, 1)],
        ]
        self._assert_values(values, dict(digits=2, resolution=0.5))


class TestToIntOrFloat:
    def test_down_to_int(self):
        assert 90 == _to_int_or_float(90.0001)

    def test_leave_as_bigger_float(self):
        assert 90.001 == _to_int_or_float(90.001)

    def test_up_to_int(self):
        assert 90 == _to_int_or_float(89.9999)

    def test_leave_as_smaller_float(self):
        assert 89.999 == _to_int_or_float(89.999)

    def test_up_to_int_small_value(self):
        assert 1 == _to_int_or_float(0.99999)

    def test_leave_as_smaller_float_small_value(self):
        assert 0.9999 == _to_int_or_float(0.9999)


class TestNormalizeNumberPair:
    def test_single_number(self):
        assert (5, 5) == _normalize_number_pair(5)
        assert (3.5, 3.5) == _normalize_number_pair(3.5)

    def test_pair_of_numbers(self):
        assert (2, 4) == _normalize_number_pair((2, 4))
        assert (1.5, 2.5) == _normalize_number_pair((1.5, 2.5))

    def test_default_value(self):
        assert (10, 20) == _normalize_number_pair(None, default=(10, 20))

    def test_value_error_when_no_value_or_default(self):
        with pytest.raises(
            ValueError, match="test_var must be a number or a sequence of two numbers"
        ):
            _normalize_number_pair(None, name="test_var")


class TestLon360:
    def test_to_lon_360_numpy(self):
        arr = np.array([-10, 0, 45, 190, -180])
        np.testing.assert_array_equal(to_lon_360(arr), np.array([350, 0, 45, 190, 180]))

    def test_to_lon_360_dataarray(self):
        arr = DataArray([-10, 0, 45, 190, -180])
        np.testing.assert_array_equal(
            to_lon_360(arr).values, np.array([350, 0, 45, 190, 180])
        )

    def test_from_lon_360_numpy(self):
        arr = np.array([350, 0, 45, 190, 180])
        np.testing.assert_array_equal(
            from_lon_360(arr), np.array([-10, 0, 45, -170, 180])
        )

    def test_from_lon_360_dataarray(self):
        arr = DataArray([350, 0, 45, 190, 180])
        np.testing.assert_array_equal(
            from_lon_360(arr).values, np.array([-10, 0, 45, -170, 180])
        )
