"""UNDEFINED sentinel (reference gridmapping/undefined.py:25-44 parity)."""

UNDEFINED_STR = "UNDEFINED"


class _Undefined:
    """Represents the UNDEFINED value — distinct from None so callers can
    pass ``default=None`` explicitly."""

    _hash_code = hash(UNDEFINED_STR) + 1

    def __str__(self):
        return UNDEFINED_STR

    def __repr__(self):
        return UNDEFINED_STR

    def __eq__(self, other):
        return self is other or isinstance(other, _Undefined)

    def __hash__(self) -> int:
        return _Undefined._hash_code


#: Singleton value used to indicate an undefined state.
UNDEFINED = _Undefined()
