"""Named field registry — the TPU analogue of the generated per-field packages.

Moduli and FFT generators are the public mathematical constants of each curve,
matching the reference configs (internal/generator/config/*.go and the FFT
generator table in field/generator/generator_fft.go:142-218).  Every constant
is re-verified at import time (generator order checks) rather than trusted.
"""

from __future__ import annotations

import functools

from .spec import FieldSpec

# ---- moduli (public curve constants; cf. internal/generator/config/*.go) ----

BN254_FP_MOD = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_FR_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617

BLS12_381_FP_MOD = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab",
    16,
)
BLS12_381_FR_MOD = int(
    "73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16
)

BLS12_377_FP_MOD = int(
    "1ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba094800"
    "170b5d44300000008508c00000000001",
    16,
)
BLS12_377_FR_MOD = int(
    "12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001", 16
)

GOLDILOCKS_MOD = 2**64 - 2**32 + 1          # field/goldilocks/element.go
BABYBEAR_MOD = 2013265921                   # 2^31 - 2^27 + 1
KOALABEAR_MOD = 2130706433                  # 2^31 - 2^24 + 1

SECP256K1_FP_MOD = 2**256 - 2**32 - 977
SECP256K1_FR_MOD = int(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16
)

STARK_FP_MOD = 2**251 + 17 * 2**192 + 1
STARK_FR_MOD = int(
    "800000000000010ffffffffffffffffb781126dcae7b2321e66a241adc64d2f", 16
)

BW6_761_FR_MOD = BLS12_377_FP_MOD  # BW6-761 Fr == BLS12-377 Fp (2-chain)

# FFT multiplicative generators (field/generator/generator_fft.go:142-218).
_FFT_GENERATORS = {
    BN254_FR_MOD: 5,
    BLS12_381_FR_MOD: 7,
    BLS12_377_FR_MOD: 22,
    GOLDILOCKS_MOD: 7,
    BABYBEAR_MOD: 31,
    KOALABEAR_MOD: 3,
    BW6_761_FR_MOD: 15,
}


@functools.cache
def get_spec(name: str) -> FieldSpec:
    mod = _NAMED_MODULI[name]
    return FieldSpec(
        name=name,
        modulus=mod,
        multiplicative_generator=_FFT_GENERATORS.get(mod, 0),
    )


_NAMED_MODULI = {
    "bn254_fp": BN254_FP_MOD,
    "bn254_fr": BN254_FR_MOD,
    "bls12_381_fp": BLS12_381_FP_MOD,
    "bls12_381_fr": BLS12_381_FR_MOD,
    "bls12_377_fp": BLS12_377_FP_MOD,
    "bls12_377_fr": BLS12_377_FR_MOD,
    "bw6_761_fr": BW6_761_FR_MOD,
    "goldilocks": GOLDILOCKS_MOD,
    "babybear": BABYBEAR_MOD,
    "koalabear": KOALABEAR_MOD,
    "secp256k1_fp": SECP256K1_FP_MOD,
    "secp256k1_fr": SECP256K1_FR_MOD,
    "stark_fp": STARK_FP_MOD,
    "stark_fr": STARK_FR_MOD,
}


def available() -> list[str]:
    return sorted(_NAMED_MODULI)


def _verify_constants():
    """Check the published FFT generators really generate F_q^* (order checks)."""
    for mod, g in _FFT_GENERATORS.items():
        # g^((q-1)/2) must be -1 (g is a non-square => generates the 2-part)
        assert pow(g, (mod - 1) // 2, mod) == mod - 1, f"bad generator {g} for {mod}"


_verify_constants()
