"""Assertion helpers (port of reference test_assertions.py essentials)."""

import pytest

from xcube_resampling_tpu.gridmapping.assertions import (
    assert_given,
    assert_in,
    assert_instance,
    assert_true,
)


def test_assert_given():
    assert_given("x", name="arg")
    with pytest.raises(ValueError, match="arg must be given"):
        assert_given("", name="arg")
    with pytest.raises(ValueError, match="value must be given"):
        assert_given(None)


def test_assert_instance():
    assert_instance(42, int, name="n")
    with pytest.raises(TypeError, match="n must be an instance of"):
        assert_instance("42", int, name="n")
    with pytest.raises(TypeError):
        assert_instance("42", (int, float))


def test_assert_in():
    assert_in(1, (1, 2, 3), name="k")
    with pytest.raises(ValueError, match="k must be one of"):
        assert_in(4, (1, 2, 3), name="k")


def test_assert_true():
    assert_true(True, "should not raise")
    with pytest.raises(ValueError, match="failed"):
        assert_true(False, "failed")
    with pytest.raises(RuntimeError, match="failed"):
        assert_true(False, "failed", exception_type=RuntimeError)
