from .gt import (
    batch_compress_torus,
    batch_decompress_karabina,
    compress_torus,
    cyclotomic_square_compressed,
    decompress_karabina,
    decompress_torus,
    gt_is_in_subgroup,
)
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
    "cyclotomic_square_compressed",
    "decompress_karabina",
    "batch_decompress_karabina",
    "compress_torus",
    "decompress_torus",
    "batch_compress_torus",
    "gt_is_in_subgroup",
]
