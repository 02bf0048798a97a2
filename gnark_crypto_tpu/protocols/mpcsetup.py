"""MPC trusted setup ("powers of tau") ceremony tools.

Mirrors ecc/bn254/kzg/mpcsetup.go (MpcSetup: InitializeSetup, Contribute,
Verify, Seal) and the generic update machinery of ecc/bn254/mpcsetup/
mpcsetup.go (UpdateValues :47, sameRatio pairing check :236, Verify :92).

Contributions rescale the SRS by a fresh secret x (new[i] = x^i * old[i]) —
a batched device scalar-mul; verification folds the whole-chain consistency
into two pairing checks with a random linear combination (device MSM +
batched pairing).  Schnorr proof-of-knowledge of x is host scalar math."""

from __future__ import annotations

import dataclasses
import hashlib

import numpy as np

from ..curves import point as gp
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fft.domain import powers as dev_powers
from ..msm.msm import msm
from ..pairing import g2_from_ints, pairing_check
from ..towers.reference import twist_curve


@dataclasses.dataclass
class PokProof:
    """Schnorr PoK of x for [x]G1."""

    r: tuple
    s: int


@dataclasses.dataclass
class SetupState:
    g1_powers: list          # host affine points [tau^i]G1
    tau_g2: tuple            # [tau]G2 (host E2 affine)
    x_g1: tuple              # last contributor's [x]G1
    x_g2: tuple              # last contributor's [x]G2
    pok: PokProof | None


def initialize(cs: CurveSpec, tw, size: int) -> SetupState:
    """InitializeSetup (kzg/mpcsetup.go:20): tau = 1."""
    return SetupState(
        g1_powers=[cs.generator] * size,
        tau_g2=(tw.ts.g2x, tw.ts.g2y),
        x_g1=cs.generator,
        x_g2=(tw.ts.g2x, tw.ts.g2y),
        pok=None,
    )


def _schnorr_prove(cs: CurveSpec, x: int, nonce: int) -> PokProof:
    r_mod = cs.fr.modulus
    R = cs.ref.mul(nonce % r_mod, cs.generator)
    X = cs.ref.mul(x, cs.generator)
    c = int.from_bytes(hashlib.sha256(str((R, X)).encode()).digest(), "big") % r_mod
    return PokProof(r=R, s=(nonce + c * x) % r_mod)


def _schnorr_verify(cs: CurveSpec, X: tuple, proof: PokProof) -> bool:
    r_mod = cs.fr.modulus
    c = int.from_bytes(hashlib.sha256(str((proof.r, X)).encode()).digest(), "big") % r_mod
    lhs = cs.ref.mul(proof.s, cs.generator)
    rhs = cs.ref.add(proof.r, cs.ref.mul(c, X))
    return lhs == rhs


def contribute(cs: CurveSpec, tw, state: SetupState, x: int,
               nonce: int = 123456789) -> SetupState:
    """Contribute (kzg/mpcsetup.go:60): rescale powers by x^i on device."""
    r_mod = cs.fr.modulus
    x %= r_mod
    assert x != 0
    n = len(state.g1_powers)
    xs = dev_powers(cs.fr, x, n)
    xs_plain = mont.from_mont(cs.fr, xs)
    base = gp.affine_from_ints(cs, state.g1_powers)
    new_jac = gp.scalar_mul(cs, base, xs_plain)
    new_aff = gp.affine_to_ints(cs, gp.jac_to_affine(cs, new_jac))
    tc = twist_curve(tw.ts)
    return SetupState(
        g1_powers=list(new_aff),
        tau_g2=tc.mul(x, state.tau_g2),
        x_g1=cs.ref.mul(x, cs.generator),
        x_g2=tc.mul(x, (tw.ts.g2x, tw.ts.g2y)),
        pok=_schnorr_prove(cs, x, nonce),
    )


def verify(cs: CurveSpec, tw, state: SetupState) -> bool:
    """Verify (kzg/mpcsetup.go:96): PoK + sameRatio checks.

    (1) contributor knows x:       Schnorr PoK on [x]G1
    (2) x consistency G1/G2:       e([x]G1, G2) == e(G1, [x]G2)
    (3) powers are tau-geometric:  e(sum l_i S_{i+1}, G2) == e(sum l_i S_i, [tau]G2)
        with random l_i (single folded pairing check, sameRatio :236).
    """
    if state.pok is not None and not _schnorr_verify(cs, state.x_g1, state.pok):
        return False
    tc = twist_curve(tw.ts)
    g2 = (tw.ts.g2x, tw.ts.g2y)
    r_mod = cs.fr.modulus
    # (2): e(xG1, G2) * e(-G1, xG2) == 1
    p_dev = gp.affine_from_ints(cs, [state.x_g1, cs.ref.neg(cs.generator)])
    q_dev = g2_from_ints(tw, [g2, state.x_g2])
    if not bool(np.asarray(pairing_check(tw, p_dev, q_dev))):
        return False
    # (3): random fold of consecutive-power ratio checks
    n = len(state.g1_powers)
    if n >= 2:
        rng = np.random.default_rng(
            int.from_bytes(hashlib.sha256(str(state.x_g1).encode()).digest()[:8], "big")
        )
        lam = [int(v) for v in rng.integers(1, 2**62, n - 1)]
        lam_arr = mont.from_ints(cs.fr, lam, mont=False)
        lo = gp.affine_from_ints(cs, state.g1_powers[: n - 1])
        hi = gp.affine_from_ints(cs, state.g1_powers[1:])
        A = msm(cs, lo, lam_arr)   # sum l_i S_i
        B = msm(cs, hi, lam_arr)   # sum l_i S_{i+1}
        from ..commit.kzg import _to_host_point

        a_pt, b_pt = _to_host_point(cs, A), _to_host_point(cs, B)
        # e(B, G2) * e(-A, [tau]G2) == 1
        p_dev = gp.affine_from_ints(cs, [b_pt, cs.ref.neg(a_pt)])
        q_dev = g2_from_ints(tw, [g2, state.tau_g2])
        if not bool(np.asarray(pairing_check(tw, p_dev, q_dev))):
            return False
    return True


def seal(cs: CurveSpec, tw, state: SetupState, beacon: bytes) -> SetupState:
    """Seal (kzg/mpcsetup.go:127): final public-beacon contribution."""
    x = int.from_bytes(hashlib.sha256(beacon).digest(), "big") % cs.fr.modulus
    return contribute(cs, tw, state, x or 1)


# ---------------------------------------------------------------------------
# generic update machinery (ecc/bn254/mpcsetup/mpcsetup.go)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class UpdateProof:
    """UpdateProof (mpcsetup.go:36): [x]G1 + PoK pi = x.R in G2."""

    contribution_commitment: tuple      # host G1 affine
    contribution_pok: tuple             # host G2 affine (twist coords)


def pok_base(cs: CurveSpec, tw, x_g1: tuple, challenge: bytes, dst: int):
    """R = HashToG2(marshal([x]G1) || challenge, [dst]) (mpcsetup.go:24)."""
    from ..curves.hash_to_g2 import hash_to_g2
    from ..curves.marshal import g1_to_bytes

    msg = g1_to_bytes(cs, x_g1) + challenge
    return hash_to_g2(tw.ts.name, msg, bytes([dst]))


def update_values(cs: CurveSpec, tw, contribution: int | None,
                  challenge: bytes, dst: int, representations: list):
    """UpdateValues (mpcsetup.go:47): scale arbitrary G1/G2 representation
    sets by x and return the update proof.  representations: list whose items
    are ('g1', [host G1 points]) or ('g2', [host G2 points]); scaled lists are
    returned alongside the proof."""
    r_mod = cs.fr.modulus
    if not contribution:
        import secrets

        contribution = secrets.randbelow(r_mod - 1) + 1
    x = contribution % r_mod
    tc = twist_curve(tw.ts)
    x_g1 = cs.ref.mul(x, cs.generator)
    scaled = []
    for kind, pts in representations:
        if kind == "g1":
            scaled.append((kind, [cs.ref.mul(x, P) for P in pts]))
        elif kind == "g2":
            scaled.append((kind, [tc.mul(x, P) for P in pts]))
        else:
            raise ValueError(f"unsupported representation kind {kind!r}")
    base = pok_base(cs, tw, x_g1, challenge, dst)
    pok = tc.mul(x, base)
    return UpdateProof(x_g1, pok), scaled


def same_ratio(tw, cs: CurveSpec, n1, d1, n2, d2) -> bool:
    """sameRatio (mpcsetup.go:236): n1/d1 == n2/d2 via
    e(n1, d2) * e(-d1, n2) == 1.  n1/d1 host G1; n2/d2 host G2."""
    p_dev = gp.affine_from_ints(cs, [n1, cs.ref.neg(d1)])
    q_dev = g2_from_ints(tw, [d2, n2])
    return bool(np.asarray(pairing_check(tw, p_dev, q_dev)))


def verify_update(cs: CurveSpec, tw, proof: UpdateProof, challenge: bytes,
                  dst: int, previous: list, next_: list,
                  rng=None) -> bool:
    """UpdateProof.Verify (mpcsetup.go:92): PoK check + one folded sameRatio
    per group over random linear combinations of (previous, next) sets."""
    r_mod = cs.fr.modulus
    tc = twist_curve(tw.ts)
    if proof.contribution_commitment is None or proof.contribution_pok is None:
        return False                      # zero contribution not allowed
    # on-curve + subgroup membership of the proof points (mpcsetup.go:93
    # Verify: IsInSubGroup on both contributionCommitment and contributionPok)
    # BEFORE any pairing — a forged off-curve / out-of-subgroup point (the
    # twist has a large cofactor) must never reach sameRatio.
    if not cs.ref.is_on_curve(proof.contribution_commitment):
        return False
    if cs.ref.mul(r_mod, proof.contribution_commitment) is not None:
        return False
    if not tc.is_on_curve(proof.contribution_pok):
        return False
    if tc.mul(r_mod, proof.contribution_pok) is not None:
        return False
    g1_prev = [P for k, pts in previous if k == "g1" for P in pts]
    g1_next = [P for k, pts in next_ if k == "g1" for P in pts]
    g2_prev = [P for k, pts in previous if k == "g2" for P in pts]
    g2_next = [P for k, pts in next_ if k == "g2" for P in pts]
    if len(g1_prev) != len(g1_next) or len(g2_prev) != len(g2_next):
        return False
    if rng is None:
        import secrets

        draw = lambda: secrets.randbelow(r_mod)
    else:
        draw = lambda: int.from_bytes(rng.bytes(2 * cs.fr.n_limbs), "big") % r_mod
    m = max(len(g1_prev), len(g2_prev))
    lams = [1] + [0] * (m - 1) if m else []
    if m > 1:
        a = draw()
        cur = a
        for i in range(1, m):
            lams[i] = cur
            cur = cur * a % r_mod

    base = pok_base(cs, tw, proof.contribution_commitment, challenge, dst)
    # pi =? x.R  i.e.  x/G1 == pi/R
    if not same_ratio(tw, cs, proof.contribution_commitment, cs.generator,
                      proof.contribution_pok, base):
        return False
    if g1_prev:
        prev = _lincomb_g1(cs, g1_prev, lams)
        nxt = _lincomb_g1(cs, g1_next, lams)
        if not same_ratio(tw, cs, nxt, prev, proof.contribution_pok, base):
            return False
    if g2_prev:
        prev = _lincomb_g2(tc, g2_prev, lams, r_mod)
        nxt = _lincomb_g2(tc, g2_next, lams, r_mod)
        if not same_ratio(tw, cs, proof.contribution_commitment, cs.generator,
                          nxt, prev):
            return False
    return True


def _lincomb_g1(cs: CurveSpec, pts: list, lams: list):
    acc = None
    for P, l in zip(pts, lams):
        acc = cs.ref.add(acc, cs.ref.mul(l, P))
    return acc


def _lincomb_g2(tc, pts: list, lams: list, r_mod: int):
    acc = None
    for P, l in zip(pts, lams):
        acc = tc.add(acc, tc.mul(l % r_mod, P))
    return acc


def beacon_contributions(hash_: bytes, dst: bytes, beacon: bytes,
                         n: int, q: int) -> list[int]:
    """BeaconContributions (mpcsetup.go:184): n reproducible nonzero field
    elements from a public beacon, via ExpandMsgXmd."""
    from ..hashes.hash_to_field import hash_to_field

    buf = hash_ + beacon
    while True:
        res = hash_to_field(buf, dst, q, n)
        if all(v != 0 for v in res):
            return res
        buf += b"="
