"""Assertion helpers (reference gridmapping/assertions.py:28-93 parity)."""

from __future__ import annotations

from collections.abc import Container
from typing import Any

_DEFAULT_NAME = "value"


def assert_given(
    value: Any, name: str = None, exception_type: type[Exception] = ValueError
):
    """Raise *exception_type* if *value* is falsy."""
    if not value:
        raise exception_type(f"{name or _DEFAULT_NAME} must be given")


def assert_instance(
    value: Any,
    dtype: type | tuple[type, ...],
    name: str | None = None,
    exception_type: type[Exception] = TypeError,
):
    """Raise *exception_type* if *value* is not an instance of *dtype*."""
    if not isinstance(value, dtype):
        raise exception_type(
            f"{name or _DEFAULT_NAME} must be an instance of {dtype}, was {type(value)}"
        )


def assert_in(
    value: Any,
    container: Container,
    name: str = None,
    exception_type: type[Exception] = ValueError,
):
    """Raise *exception_type* if *value* is not a member of *container*."""
    if value not in container:
        raise exception_type(f"{name or _DEFAULT_NAME} must be one of {container}")


def assert_true(value: Any, message: str, exception_type: type[Exception] = ValueError):
    """Raise *exception_type* with *message* if *value* is falsy."""
    if not value:
        raise exception_type(message)
