"""EdDSA on the twisted-Edwards companion curve (eddsa.go:33-230 semantics):
blake2b key blinding, MiMC (or any fr hash) for H(R, A, M), cofactor-cleared
verification.  Single sign/verify run host-side (latency-bound scalar work);
`batch_verify` checks many signatures at once on device (the TPU-shaped path).
"""

from __future__ import annotations

import dataclasses
import hashlib

import numpy as np

from ..curves.edwards import (
    EdOracle,
    EdwardsSpec,
    ed_add,
    ed_from_affine,
    ed_from_ints,
    ed_scalar_mul,
    ed_to_affine,
    ed_to_ints,
)
from ..fields import mont
from ..hashes.mimc import MiMC


class MiMCBytes:
    """gnark hash.Hash-style byte interface over MiMC (mimc.go Write/Sum)."""

    def __init__(self, m: MiMC):
        self.m = m
        self.block = m.fr.bytes
        self.data: list[int] = []

    def write(self, p: bytes):
        bs = self.block
        if 0 < len(p) < bs:
            p = b"\x00" * (bs - len(p)) + p
        assert len(p) % bs == 0, "input must be whole field elements"
        for i in range(0, len(p), bs):
            v = int.from_bytes(p[i : i + bs], "big")
            assert v < self.m.fr.modulus, "non-canonical field element"
            self.data.append(v)

    def sum(self) -> bytes:
        h = self.m.hash_ints(self.data) if self.data else 0
        return int(h).to_bytes(self.block, "big")


@dataclasses.dataclass
class PrivateKey:
    scalar: int
    rand_src: bytes
    public: "PublicKey"


@dataclasses.dataclass
class PublicKey:
    a: tuple  # affine (x, y) ints


@dataclasses.dataclass
class Signature:
    r: tuple  # affine (x, y)
    s: int


def generate_key(es: EdwardsSpec, seed: bytes) -> PrivateKey:
    """GenerateKey (eddsa.go:52): blake2b-512 split + RFC8032 pruning."""
    assert len(seed) == 32
    h = bytearray(hashlib.blake2b(seed).digest())
    rand_src = bytes(h[32:64])
    h[0] &= 0xF8
    h[31] &= 0x7F
    h[31] |= 0x40
    scalar = int.from_bytes(bytes(h[:32][::-1]), "big")  # little-endian per spec
    o = EdOracle(es)
    A = o.mul(scalar, (es.bx, es.by))
    return PrivateKey(scalar=scalar, rand_src=rand_src, public=PublicKey(a=A))


def _hram(es: EdwardsSpec, hasher: MiMCBytes, R, A, message: bytes) -> int:
    bs = hasher.block
    for v in (R[0], R[1], A[0], A[1]):
        hasher.write(int(v).to_bytes(bs, "big"))
    hasher.write(message)
    return int.from_bytes(hasher.sum(), "big")


def sign(es: EdwardsSpec, priv: PrivateKey, message: bytes, mimc: MiMC) -> Signature:
    """Sign (eddsa.go:110)."""
    blind = int.from_bytes(
        hashlib.blake2b(priv.rand_src + message).digest()[:32], "big"
    )
    o = EdOracle(es)
    R = o.mul(blind, (es.bx, es.by))
    hram = _hram(es, MiMCBytes(mimc), R, priv.public.a, message)
    s = (blind + hram * priv.scalar) % es.order
    return Signature(r=R, s=s)


def verify(es: EdwardsSpec, pub: PublicKey, sig: Signature, message: bytes,
           mimc: MiMC) -> bool:
    """Verify (eddsa.go:178): 2^c(S*B) == 2^c(R + H(R,A,M)*A)."""
    o = EdOracle(es)
    if not o.is_on_curve(sig.r) or not o.is_on_curve(pub.a):
        return False
    hram = _hram(es, MiMCBytes(mimc), sig.r, pub.a, message)
    lhs = o.mul(es.cofactor, o.mul(sig.s, (es.bx, es.by)))
    rhs = o.mul(es.cofactor, o.add(sig.r, o.mul(hram, pub.a)))
    return lhs == rhs


def batch_verify(es: EdwardsSpec, pubs, sigs, messages, mimc: MiMC) -> np.ndarray:
    """Device-batched verification of N signatures (the TPU-worthy shape):
    hram via batched MiMC, both scalar muls via batched Edwards ladders."""
    n = len(pubs)
    hrams = [
        _hram(es, MiMCBytes(mimc), s.r, p.a, m)
        for p, s, m in zip(pubs, sigs, messages)
    ]
    f = es.fr
    base = ed_from_affine(es, ed_from_ints(es, [(es.bx, es.by)] * n))
    A = ed_from_affine(es, ed_from_ints(es, [p.a for p in pubs]))
    R = ed_from_affine(es, ed_from_ints(es, [s.r for s in sigs]))
    s_arr = mont.from_ints(f, [s.s for s in sigs], mont=False)
    h_arr = mont.from_ints(f, hrams, mont=False)
    lhs = ed_scalar_mul(es, base, s_arr)
    rhs = ed_add(es, R, ed_scalar_mul(es, A, h_arr))
    for _ in range(es.cofactor.bit_length() - 1):  # cofactor is a power of 2
        lhs = ed_add(es, lhs, lhs)
        rhs = ed_add(es, rhs, rhs)
    la = ed_to_ints(es, ed_to_affine(es, lhs))
    ra = ed_to_ints(es, ed_to_affine(es, rhs))
    return np.array([la[i] == ra[i] for i in range(n)])
