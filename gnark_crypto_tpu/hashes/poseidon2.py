"""Poseidon2 permutation over fr, batched — bit-faithful to the reference
(ecc/bn254/fr/poseidon2/poseidon2.go).

Faithfulness notes (the reference generator has quirks we replicate exactly so
outputs match):
- InitRC (:58) runs three keccak-chain loops that all write roundKeys[i]
  starting at i=0, so early rows are overwritten while rows past
  max(rF/2, rP) stay empty; the chain state still advances through all
  draws.  We simulate the three loops literally.
- rounds whose key row is empty add no key (addRoundKeyInPlace iterates the
  row length, :205).
- t in {2, 3} use the hardcoded external/internal matrices (:142-190); the
  reference's t>=4 internal-matrix path reads an uninitialized diagonal, so we
  reject those widths rather than reproduce a degenerate permutation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.fields import get_spec
from ..fields.spec import FieldSpec
from ..utils.keccak import keccak256


def init_rc(seed: str, rf: int, rp: int, t: int, modulus: int):
    """Replicates InitRC exactly (overwrites and all)."""
    rnd = keccak256(seed.encode())

    def draw():
        nonlocal rnd
        rnd = keccak256(rnd)
        return int.from_bytes(rnd, "big") % modulus

    keys: list[list[int]] = [[] for _ in range(rf + rp)]
    for i in range(rf // 2):
        keys[i] = [draw() for _ in range(t)]
    for i in range(rp):
        keys[i] = [draw()]
    for i in range(rf // 2):
        keys[i] = [draw() for _ in range(t)]
    return keys


@dataclasses.dataclass(frozen=True)
class Poseidon2:
    fr: FieldSpec
    t: int
    rf: int
    rp: int
    seed: str = "seed"

    def __post_init__(self):
        assert self.t in (2, 3) or self.t % 4 == 0, (
            "reference poseidon2 widths: 2, 3, or a multiple of 4"
        )

    @functools.cached_property
    def round_keys(self):
        return init_rc(self.seed, self.rf, self.rp, self.t, self.fr.modulus)

    def _add_key(self, state, round_idx):
        f = self.fr
        keys = self.round_keys[round_idx]
        out = list(state)
        for i, k in enumerate(keys):
            out[i] = mont.add(f, out[i], mont.const(f, k, ()))
        return out

    def _sbox(self, x):
        f = self.fr
        return mont.mul(f, mont.square(f, mont.square(f, x)), x)

    def _ext(self, s):
        """matMulExternalInPlace (poseidon2.go:141): t=2: circ(2,1);
        t=3: circ(2,1,1); t%4==0: circ(2M4, M4, ..) via matMulM4."""
        f = self.fr
        if self.t == 2:
            tmp = mont.add(f, s[0], s[1])
            return [mont.add(f, tmp, s[0]), mont.add(f, tmp, s[1])]
        if self.t == 3:
            tmp = mont.add(f, mont.add(f, s[0], s[1]), s[2])
            return [mont.add(f, tmp, x) for x in s]
        out = self._m4(s)
        if self.t == 4:
            return out
        # t >= 8 circulant fold — replicated EXACTLY as written in the
        # reference (poseidon2.go:168-172), where lanes 4i+1..4i+3 add their
        # column sum to the freshly UPDATED lane 4i value rather than their
        # own — byte-compatibility over textbook linear algebra.
        c = self.t // 4
        tmp = [functools.reduce(lambda a, b: mont.add(f, a, b),
                                [out[4 * i + j] for i in range(c)])
               for j in range(4)]
        res = list(out)
        for i in range(c):
            res[4 * i] = mont.add(f, out[4 * i], tmp[0])
            for j in (1, 2, 3):
                res[4 * i + j] = mont.add(f, res[4 * i], tmp[j])
        return res

    def _m4(self, s):
        """matMulM4InPlace (poseidon2.go:117): per 4-lane chunk, multiply by
        M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] with the reference's
        add/double chain."""
        f = self.fr
        out = []
        for i in range(0, len(s), 4):
            s0, s1, s2, s3 = s[i : i + 4]
            t0 = mont.add(f, s0, s1)
            t1 = mont.add(f, s2, s3)
            t2 = mont.add(f, mont.double(f, s1), t1)
            t3 = mont.add(f, mont.double(f, s3), t0)
            t4 = mont.add(f, mont.double(f, mont.double(f, t1)), t3)
            t5 = mont.add(f, mont.double(f, mont.double(f, t0)), t2)
            t6 = mont.add(f, t3, t5)
            t7 = mont.add(f, t2, t4)
            out.extend([t6, t5, t7, t4])
        return out

    def _int(self, s):
        """matMulInternalInPlace: t=2 [[2,1],[1,3]]; t=3 [[2,1,1],[1,2,1],[1,1,3]].
        t>=4 rejected: the reference reads an uninitialized internal diagonal
        there (poseidon2.go:198 diagInternalMatrices is never filled)."""
        assert self.t in (2, 3), (
            "poseidon2 permutation defined for t in {2,3} only; "
            "t%4==0 supports the external matrix (mat_mul_external)")
        f = self.fr
        if self.t == 2:
            tot = mont.add(f, s[0], s[1])
            return [
                mont.add(f, s[0], tot),
                mont.add(f, mont.double(f, s[1]), tot),
            ]
        tot = mont.add(f, mont.add(f, s[0], s[1]), s[2])
        return [
            mont.add(f, s[0], tot),
            mont.add(f, s[1], tot),
            mont.add(f, mont.double(f, s[2]), tot),
        ]

    def permutation(self, state):
        """state: list of t mont fr arrays (batched); returns new list."""
        assert len(state) == self.t
        s = self._ext(list(state))
        half = self.rf // 2
        for r in range(half):
            s = self._add_key(s, r)
            s = [self._sbox(x) for x in s]
            s = self._ext(s)
        for r in range(half, half + self.rp):
            s = self._add_key(s, r)
            s[0] = self._sbox(s[0])
            s = self._int(s)
        for r in range(half + self.rp, self.rf + self.rp):
            s = self._add_key(s, r)
            s = [self._sbox(x) for x in s]
            s = self._ext(s)
        return s

    def permutation_ints(self, values: list[int]) -> list[int]:
        arrs = [mont.from_ints(self.fr, [v]) for v in values]
        out = self.permutation(arrs)
        return [int(mont.to_ints(self.fr, x)[0]) for x in out]

    def mat_mul_external_ints(self, values: list[int]) -> list[int]:
        """Public external-matrix application (matMulExternalInPlace) on
        host ints — pinned against the reference's TestExternalMatrix
        (poseidon2_test.go:14) for t=4."""
        arrs = [mont.from_ints(self.fr, [v]) for v in values]
        out = self._ext(arrs)
        return [int(mont.to_ints(self.fr, x)[0]) for x in out]


@functools.cache
def poseidon2(field_name: str = "bn254_fr", t: int = 3, rf: int = 8, rp: int = 56) -> Poseidon2:
    return Poseidon2(fr=get_spec(field_name), t=t, rf=rf, rp=rp)
