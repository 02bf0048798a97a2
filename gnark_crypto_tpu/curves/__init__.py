from . import point
from .point import Affine, Jac
from .reference import RefCurve, derive_cofactor, derive_glv, find_point
from .spec import (
    CurveSpec,
    bls12_377,
    bls12_381,
    bls24_315,
    bls24_317,
    bn254,
    bw6_633,
    bw6_761,
    secp256k1,
    stark_curve,
)

__all__ = [
    "point",
    "Affine",
    "Jac",
    "RefCurve",
    "derive_glv",
    "derive_cofactor",
    "find_point",
    "CurveSpec",
    "bn254",
    "bls12_381",
    "bls12_377",
    "bls24_315",
    "bls24_317",
    "bw6_761",
    "bw6_633",
    "secp256k1",
    "stark_curve",
]
