"""FieldSpec: trace-time specialization of a prime field for TPU kernels.

This is the TPU-native analogue of gnark-crypto's code generator config
(reference: field/generator/config/field_config.go:24-74, which holds NbWords,
Montgomery constants QInverse/RSquare, sqrt strategy, ...).  Instead of emitting
Go source per field, we hold the constants in a frozen dataclass and build JAX
computations specialized on it at trace time.

Limb layout (the foundational decision, see SURVEY.md §7): TPUs have no 64-bit
integer multiplier, so elements are vectors of LIMB_BITS=16-bit limbs stored in
uint32 lanes.  `t + a*b + c` with 16-bit a,b,t,c fits *exactly* in 32 bits
((2^16-1)^2 + 2*(2^16-1) = 2^32-1), which makes the CIOS Montgomery loop carry
chain exact in uint32 — the 16-bit analogue of the 64-bit ADX carry chain in
field/asm/element_4w_amd64.s.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n_limbs: int) -> list[int]:
    """Little-endian 16-bit limbs of x."""
    assert 0 <= x < (1 << (LIMB_BITS * n_limbs)), "value out of range"
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)]


def limbs_to_int(limbs) -> int:
    return sum(int(l) << (LIMB_BITS * i) for i, l in enumerate(limbs))


def _jacobi(a: int, n: int) -> int:
    """Jacobi symbol (a/n), n odd positive."""
    assert n > 0 and n % 2 == 1
    a %= n
    result = 1
    while a != 0:
        while a % 2 == 0:
            a //= 2
            if n % 8 in (3, 5):
                result = -result
        a, n = n, a
        if a % 4 == 3 and n % 4 == 3:
            result = -result
        a %= n
    return result if n == 1 else 0


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """All trace-time constants of a prime field F_q with 16-bit-limb Montgomery form.

    Mirrors the role of field/generator/config/field_config.go (goff) in the
    reference: one instance per field, from which all kernels are specialized.
    """

    name: str
    modulus: int
    # generator of the full multiplicative group F_q^* (for FFT domains);
    # 0 if unknown/unneeded.
    multiplicative_generator: int = 0

    # ---- derived (set in __post_init__) ----
    n_limbs: int = dataclasses.field(init=False)
    bits: int = dataclasses.field(init=False)
    bytes: int = dataclasses.field(init=False)
    r: int = dataclasses.field(init=False)        # 2^(16*n_limbs) mod q
    r2: int = dataclasses.field(init=False)       # R^2 mod q
    r3: int = dataclasses.field(init=False)       # R^3 mod q
    qinv_neg: int = dataclasses.field(init=False)  # -q^-1 mod 2^16
    two_adicity: int = dataclasses.field(init=False)    # s with q-1 = 2^s * odd
    nonresidue: int = dataclasses.field(init=False)     # smallest QNR (Jacobi = -1)

    def __post_init__(self):
        q = self.modulus
        assert q > 2 and q % 2 == 1
        object.__setattr__(self, "bits", q.bit_length())
        n_limbs = -(-self.bits // LIMB_BITS)
        object.__setattr__(self, "n_limbs", n_limbs)
        object.__setattr__(self, "bytes", -(-self.bits // 8))
        R = 1 << (LIMB_BITS * n_limbs)
        object.__setattr__(self, "r", R % q)
        object.__setattr__(self, "r2", (R * R) % q)
        object.__setattr__(self, "r3", (R * R * R) % q)
        object.__setattr__(self, "qinv_neg", (-pow(q, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        s, odd = 0, q - 1
        while odd % 2 == 0:
            s += 1
            odd //= 2
        object.__setattr__(self, "two_adicity", s)
        # smallest quadratic nonresidue, like the reference's sqrt precompute
        # (field/generator/config/field_config.go:264-279)
        nr = 2
        while _jacobi(nr, q) != -1:
            nr += 1
        object.__setattr__(self, "nonresidue", nr)

    # ---- host-side helpers -------------------------------------------------

    def to_mont(self, x: int) -> int:
        return (x << (LIMB_BITS * self.n_limbs)) % self.modulus

    def from_mont(self, x: int) -> int:
        rinv = pow(self.r, -1, self.modulus)
        return (x * rinv) % self.modulus

    def limbs(self, x: int) -> np.ndarray:
        """uint32[n_limbs] little-endian limbs of x (no Montgomery conversion)."""
        return np.array(int_to_limbs(x % self.modulus, self.n_limbs), dtype=np.uint32)

    def mont_limbs(self, x: int) -> np.ndarray:
        return self.limbs(self.to_mont(x % self.modulus))

    @functools.cached_property
    def q_limbs(self) -> np.ndarray:
        # NB: not self.limbs(q) — that would reduce q mod q to 0.
        return np.array(int_to_limbs(self.modulus, self.n_limbs), dtype=np.uint32)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        return self.mont_limbs(1)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return self.limbs(self.r2)

    @functools.cached_property
    def sqrt_exponent(self) -> int:
        """(s+1)/2 exponent for Tonelli-Shanks initial guess: (odd+1)//2 where q-1=2^s*odd."""
        odd = (self.modulus - 1) >> self.two_adicity
        return (odd + 1) // 2

    @functools.cached_property
    def tonelli_z(self) -> int:
        """nonresidue^odd — generator of the 2-Sylow subgroup."""
        odd = (self.modulus - 1) >> self.two_adicity
        return pow(self.nonresidue, odd, self.modulus)
