from .monty31 import BABY_BEAR, FIELDS, KOALA_BEAR, Monty31, U32
from .extension import (
    BinomialExtension,
    QuinticTrinomialExtension,
    ext_field,
)
import functools as _functools


@_functools.lru_cache(maxsize=None)
def koala_bear_quintic() -> QuinticTrinomialExtension:
    """The reference's KoalaBear quintic challenge field x^5 + x^2 − 1."""
    return QuinticTrinomialExtension(KOALA_BEAR)


__all__ = [
    "BABY_BEAR",
    "KOALA_BEAR",
    "FIELDS",
    "Monty31",
    "U32",
    "BinomialExtension",
    "QuinticTrinomialExtension",
    "ext_field",
    "koala_bear_quintic",
]
