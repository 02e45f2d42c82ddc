from .monty31 import BABY_BEAR, FIELDS, KOALA_BEAR, Monty31, U32
from .extension import BinomialExtension, ext_field

__all__ = [
    "BABY_BEAR",
    "KOALA_BEAR",
    "FIELDS",
    "Monty31",
    "U32",
    "BinomialExtension",
    "ext_field",
]
