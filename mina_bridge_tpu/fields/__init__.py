from .params import FP, FQ, LIMB_BITS, NLIMBS, FieldSpec, int_to_limbs, limbs_to_int
from . import ff, host

__all__ = [
    "FP",
    "FQ",
    "LIMB_BITS",
    "NLIMBS",
    "FieldSpec",
    "int_to_limbs",
    "limbs_to_int",
    "ff",
    "host",
]
