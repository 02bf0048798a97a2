"""ECDSA over any registered Weierstrass curve (ecc/<curve>/ecdsa/ecdsa.go:
44-321 semantics, incl. secp256k1 / stark-curve).

Host sign/verify (latency-bound), device `batch_verify` for throughput.
Nonce: SHA-512(secret ∥ entropy ∥ msg-hash)-keyed deterministic stream
(reference uses the same construction with an AES-CTR CSPRNG; we draw directly
from iterated SHA-512 which is equally indifferentiable for test purposes —
signatures are not bit-identical to the reference since its nonce includes OS
entropy, which is unreproducible by design)."""

from __future__ import annotations

import dataclasses
import hashlib

import numpy as np

from ..curves import point as gp
from ..curves.spec import CurveSpec
from ..fields import mont


@dataclasses.dataclass
class PublicKey:
    a: tuple  # affine (x, y)


@dataclasses.dataclass
class PrivateKey:
    scalar: int
    public: PublicKey


@dataclasses.dataclass
class Signature:
    r: int
    s: int


def hash_to_int(h: bytes, cs: CurveSpec) -> int:
    """HashToInt (ecdsa.go:95): left-most order-bits of the hash."""
    size = cs.fr.bytes
    if len(h) > size:
        h = h[:size]
    ret = int.from_bytes(h, "big")
    excess = ret.bit_length() - cs.fr.bits
    if excess > 0:
        ret >>= excess
    return ret


def generate_key(cs: CurveSpec, seed: bytes) -> PrivateKey:
    k = (int.from_bytes(hashlib.sha512(b"key" + seed).digest(), "big")
         % (cs.fr.modulus - 1)) + 1
    A = cs.ref.mul(k, cs.generator)
    return PrivateKey(scalar=k, public=PublicKey(a=A))


def _nonce(priv: PrivateKey, msg_hash: bytes, entropy: bytes, cs: CurveSpec) -> int:
    state = hashlib.sha512(
        priv.scalar.to_bytes(cs.fr.bytes, "big") + entropy + msg_hash
    ).digest()
    k = 0
    while True:
        state = hashlib.sha512(state).digest()
        k = (int.from_bytes(state, "big") % (cs.fr.modulus - 1)) + 1
        if k != 0:
            return k


def sign(cs: CurveSpec, priv: PrivateKey, msg_hash: bytes,
         entropy: bytes = b"") -> Signature:
    """SEC 1 v2.0 4.1.3 (SignForRecover, ecdsa.go:235 without recovery bits)."""
    r_mod = cs.fr.modulus
    m = hash_to_int(msg_hash, cs)
    while True:
        k = _nonce(priv, msg_hash, entropy, cs)
        P = cs.ref.mul(k, cs.generator)
        r = P[0] % r_mod
        if r == 0:
            continue
        s = pow(k, -1, r_mod) * (m + priv.scalar * r) % r_mod
        if s == 0:
            continue
        return Signature(r=r, s=s)


def sign_for_recover(cs: CurveSpec, priv: PrivateKey, msg_hash: bytes,
                     entropy: bytes = b"") -> tuple[int, Signature]:
    """SignForRecover (ecdsa.go:235): also returns the recovery id v —
    bit 0 = oddity of P.y, bit 1 = how many times P.x overflowed r."""
    r_mod = cs.fr.modulus
    m = hash_to_int(msg_hash, cs)
    while True:
        k = _nonce(priv, msg_hash, entropy, cs)
        P = cs.ref.mul(k, cs.generator)
        v = ((P[0] // r_mod) << 1) | (P[1] & 1)
        r = P[0] % r_mod
        if r == 0:
            continue
        s = pow(k, -1, r_mod) * (m + priv.scalar * r) % r_mod
        if s == 0:
            continue
        return v, Signature(r=r, s=s)


def recover_p(cs: CurveSpec, v: int, r: int) -> tuple:
    """Reconstruct the nonce point P from (v, r) (recoverP, ecdsa.go:111)."""
    if not 0 < r < cs.fr.modulus:
        raise ValueError("r out of range")
    from ..fields.reference import PF

    p = cs.fp.modulus
    x = r + ((v >> 1) & 1) * cs.fr.modulus
    if x >= p:
        raise ValueError("x out of base-field range")
    y2 = (pow(x, 3, p) + cs.a * x + cs.b) % p
    pf = PF(p)
    if pf.legendre(y2) == -1:
        raise ValueError("no square root: invalid recovery data")
    y = pf.sqrt(y2)
    if (y & 1) != (v & 1):
        y = p - y
    return (x, y)


def recover_public_key(cs: CurveSpec, v: int, sig: Signature,
                       msg_hash: bytes) -> PublicKey:
    """ECDSA public-key recovery (PublicKey.RecoverFrom, ecdsa.go):
    A = r^-1 (s·P - m·G) with P = recoverP(v, r)."""
    r_mod = cs.fr.modulus
    P = recover_p(cs, v, sig.r)
    m = hash_to_int(msg_hash, cs)
    rinv = pow(sig.r, -1, r_mod)
    sP = cs.ref.mul(sig.s * rinv % r_mod, P)
    mG = cs.ref.mul((-m * rinv) % r_mod, cs.generator)
    A = cs.ref.add(sP, mG)
    if A is None:
        raise ValueError("recovered point at infinity")
    return PublicKey(a=A)


def verify(cs: CurveSpec, pub: PublicKey, sig: Signature, msg_hash: bytes) -> bool:
    """SEC 1 v2.0 4.1.4 (Verify, ecdsa.go)."""
    r_mod = cs.fr.modulus
    if not (0 < sig.r < r_mod and 0 < sig.s < r_mod):
        return False
    if not cs.ref.is_on_curve(pub.a) or pub.a is None:
        return False
    m = hash_to_int(msg_hash, cs)
    sinv = pow(sig.s, -1, r_mod)
    u1 = m * sinv % r_mod
    u2 = sig.r * sinv % r_mod
    P = cs.ref.add(cs.ref.mul(u1, cs.generator), cs.ref.mul(u2, pub.a))
    if P is None:
        return False
    return P[0] % r_mod == sig.r


def batch_verify(cs: CurveSpec, pubs, sigs, msg_hashes) -> np.ndarray:
    """Device-batched verification: u1*G + u2*A via batched ladders."""
    r_mod = cs.fr.modulus
    n = len(pubs)
    u1s, u2s = [], []
    ok_pre = []
    for pub, sig, mh in zip(pubs, sigs, msg_hashes):
        valid = 0 < sig.r < r_mod and 0 < sig.s < r_mod and pub.a is not None
        ok_pre.append(valid)
        sinv = pow(sig.s, -1, r_mod) if valid else 1
        m = hash_to_int(mh, cs)
        u1s.append(m * sinv % r_mod)
        u2s.append(sig.r * sinv % r_mod)
    G = gp.affine_from_ints(cs, [cs.generator] * n)
    A = gp.affine_from_ints(cs, [p.a for p in pubs])
    t1 = gp.scalar_mul(cs, G, mont.from_ints(cs.fr, u1s, mont=False))
    t2 = gp.scalar_mul(cs, A, mont.from_ints(cs.fr, u2s, mont=False))
    P = gp.jac_to_affine(cs, gp.jac_add(cs, t1, t2))
    xs = mont.to_ints(cs.fp, P.x)
    inf = np.asarray(gp.affine_is_inf(cs, P))
    out = []
    for i, (sig, pre) in enumerate(zip(sigs, ok_pre)):
        out.append(bool(pre) and not inf[i] and int(xs[i]) % r_mod == sig.r)
    return np.array(out)
