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
