from .pairing import (
    G2Affine,
    final_exponentiation,
    g2_from_ints,
    g2_is_inf,
    g2_neg,
    miller_loop,
    pair,
    pairing_check,
    pairing_ctx,
)

__all__ = [
    "G2Affine",
    "final_exponentiation",
    "g2_from_ints",
    "g2_is_inf",
    "g2_neg",
    "miller_loop",
    "pair",
    "pairing_check",
    "pairing_ctx",
]
