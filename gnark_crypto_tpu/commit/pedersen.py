"""Pedersen vector commitment + proof of knowledge (ecc/bn254/fr/pedersen/
pedersen.go:19-226): commitments are device MSMs; the pairing check of the
knowledge proof runs on the batched device pairing."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..curves import point as gp
from ..curves.spec import CurveSpec
from ..fields import mont
from ..msm.msm import msm
from ..pairing import g2_from_ints, pairing_check
from ..towers.reference import twist_curve


@dataclasses.dataclass
class ProvingKey:
    basis: gp.Affine              # device SoA
    basis_exp_sigma: gp.Affine


@dataclasses.dataclass
class VerifyingKey:
    g: tuple                      # host G2 affine (E2 pairs)
    g_sigma_neg: tuple            # [-sigma]G


def setup(cs: CurveSpec, tw, bases_host: list, sigma: int):
    """Setup (pedersen.go:64) with explicit (test) sigma; bases_host: list of
    affine int points."""
    r = cs.fr.modulus
    sigma %= r
    basis = gp.affine_from_ints(cs, bases_host)
    exp = [cs.ref.mul(sigma, b) for b in bases_host]
    basis_exp = gp.affine_from_ints(cs, exp)
    tc = twist_curve(tw.ts)
    g2 = (tw.ts.g2x, tw.ts.g2y)
    vk = VerifyingKey(g=g2, g_sigma_neg=tc.mul((-sigma) % r, g2))
    return ProvingKey(basis=basis, basis_exp_sigma=basis_exp), vk


def commit(cs: CurveSpec, pk: ProvingKey, values) -> tuple:
    """Commit (pedersen.go:120): MSM over the basis; values: mont fr array."""
    scalars = mont.from_mont(cs.fr, values)
    out = msm(cs, pk.basis, scalars)
    from .kzg import _to_host_point

    return _to_host_point(cs, out)


def prove_knowledge(cs: CurveSpec, pk: ProvingKey, values) -> tuple:
    """ProveKnowledge (pedersen.go:101): MSM over sigma-basis."""
    scalars = mont.from_mont(cs.fr, values)
    out = msm(cs, pk.basis_exp_sigma, scalars)
    from .kzg import _to_host_point

    return _to_host_point(cs, out)


def verify(tw, cs: CurveSpec, vk: VerifyingKey, commitment: tuple, pok: tuple) -> bool:
    """Verify (pedersen.go:160): e(commit, G^sigma)... folded as
    e(commitment, g) * e(pok, gSigmaNeg)... == 1, i.e.
    e(commitment, [sigma]G2) == e(pok, G2) <=> e(pok, G)*e(commitment, -..)."""
    # check: e(commitment_sigma, G) == e(commitment, G_sigma)
    # gnark form: e(pok, G) * e(commitment, GSigmaNeg) == 1
    p_dev = gp.affine_from_ints(cs, [pok, commitment])
    q_dev = g2_from_ints(tw, [vk.g, vk.g_sigma_neg])
    return bool(np.asarray(pairing_check(tw, p_dev, q_dev)))
