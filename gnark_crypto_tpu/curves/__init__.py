from . import point
from .point import Affine, Jac
from .reference import RefCurve, derive_glv
from .spec import CurveSpec, bls12_377, bls12_381, bn254, secp256k1, stark_curve

__all__ = [
    "point",
    "Affine",
    "Jac",
    "RefCurve",
    "derive_glv",
    "CurveSpec",
    "bn254",
    "bls12_381",
    "bls12_377",
    "secp256k1",
    "stark_curve",
]
