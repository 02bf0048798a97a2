from . import mont
from .fields import available, get_spec
from .reference import PF
from .spec import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs, limbs_to_int

__all__ = [
    "mont",
    "available",
    "get_spec",
    "PF",
    "FieldSpec",
    "LIMB_BITS",
    "LIMB_MASK",
    "int_to_limbs",
    "limbs_to_int",
]
