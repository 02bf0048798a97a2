"""MiMC (Miyaguchi-Preneel) over fr, batched.

Bit-compatible with the reference (ecc/bn254/fr/mimc/mimc.go): constants are
the keccak256 chain seeded with "seed" (initConstants :176), the round
function is m <- (m + h + c_i)^e with e = 5 (or 17 for bls12-377), and the
compression is h <- encrypt(m) + h + m (checksum :130).

The device kernel is batched over independent hash *instances*; the per-block
chain within one instance is inherently sequential (scan)."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.fields import get_spec
from ..fields.spec import FieldSpec
from ..utils.keccak import keccak256

# (rounds, sbox exponent) per field — cf. mimcNbRounds in each
# ecc/<curve>/fr/mimc/mimc.go
_PARAMS = {
    "bn254_fr": (110, 5),
    "bls12_381_fr": (111, 5),
    "bls12_377_fr": (62, 17),
    "bw6_761_fr": (163, 5),
    "bls24_315_fr": (109, 5),   # ecc/bls24-315/fr/mimc/mimc.go:27,:157 (x^5)
    "bls24_317_fr": (91, 7),    # ecc/bls24-317/fr/mimc/mimc.go:27,:157 (x^7)
    "bw6_633_fr": (136, 5),     # ecc/bw6-633/fr/mimc/mimc.go:27,:157 (x^5)
}


def mimc_constants(modulus: int, rounds: int, seed: bytes = b"seed") -> list[int]:
    """keccak chain: rnd = K(seed); then c_i = K(rnd), rnd = c_i."""
    rnd = keccak256(seed)
    out = []
    for _ in range(rounds):
        rnd = keccak256(rnd)
        out.append(int.from_bytes(rnd, "big") % modulus)
    return out


@dataclasses.dataclass(frozen=True)
class MiMC:
    fr: FieldSpec
    rounds: int
    exponent: int

    @functools.cached_property
    def constants(self):
        cs = mimc_constants(self.fr.modulus, self.rounds)
        return jnp.asarray(
            np.stack([self.fr.mont_limbs(c) for c in cs], axis=1)
        )  # (n_limbs, rounds)

    def _sbox(self, x):
        f = self.fr
        if self.exponent == 5:
            return mont.mul(f, mont.square(f, mont.square(f, x)), x)
        if self.exponent == 17:
            y = mont.square(f, x)
            y = mont.square(f, y)
            y = mont.square(f, y)
            y = mont.square(f, y)
            return mont.mul(f, y, x)
        return mont.pow_const(f, x, self.exponent)

    def encrypt(self, h, m):
        """m <- sbox(m + h + c_i) for each round, then + h (encrypt :150)."""
        f = self.fr

        def body(mm, c):
            # c: (n_limbs,) broadcasts against the batch
            tmp = mont.add(f, mont.add(f, mm, h), c)
            return self._sbox(tmp), None

        cs = jnp.moveaxis(self.constants, 1, 0)  # (rounds, n_limbs)
        m, _ = jax.lax.scan(body, m, cs)
        return mont.add(f, m, h)

    def hash_blocks(self, blocks):
        """blocks: (n_limbs, n_blocks, *batch) mont fr elements -> (n_limbs,
        *batch).  h <- encrypt(b) + h + b per block (checksum :130)."""
        f = self.fr
        batch = blocks.shape[2:]
        h = mont.zeros(f, batch)
        for i in range(blocks.shape[1]):
            b = blocks[:, i]
            r = self.encrypt(h, b)
            h = mont.add(f, mont.add(f, r, h), b)
        return h

    def hash_ints(self, values: list[int]) -> int:
        """Host convenience: hash a list of field elements, one instance."""
        arr = mont.from_ints(self.fr, values)  # (n_limbs, n)
        h = self.hash_blocks(arr[:, :, None])
        return int(mont.to_ints(self.fr, h)[0])


@functools.cache
def mimc(field_name: str) -> MiMC:
    rounds, exp = _PARAMS[field_name]
    return MiMC(fr=get_spec(field_name), rounds=rounds, exponent=exp)
