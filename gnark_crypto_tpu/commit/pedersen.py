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


def batch_prove(cs: CurveSpec, pks: list, values_list: list, coeff: int):
    """BatchProve (pedersen.go:144): one amalgamated MSM over the
    sigma-bases with values of key i scaled by coeff^i."""
    assert len(pks) == len(values_list) and pks
    if len(pks) == 1:
        return prove_knowledge(cs, pks[0], values_list[0])
    r = cs.fr.modulus
    import jax.numpy as jnp

    basis_x = jnp.concatenate([pk.basis_exp_sigma.x for pk in pks], axis=1)
    basis_y = jnp.concatenate([pk.basis_exp_sigma.y for pk in pks], axis=1)
    scaled = [values_list[0]]
    r_i = coeff % r
    for i in range(1, len(pks)):
        scaled.append(mont.mul_const(cs.fr, values_list[i], r_i))
        if i + 1 < len(pks):
            r_i = r_i * coeff % r
    values = jnp.concatenate(scaled, axis=1)
    out = msm(cs, gp.Affine(basis_x, basis_y), mont.from_mont(cs.fr, values))
    from .kzg import _to_host_point

    return _to_host_point(cs, out)


def fold_commitments(cs: CurveSpec, commitments: list, coeff: int):
    """G1Affine.Fold analogue: sum_i coeff^i * C_i (host points)."""
    r = cs.fr.modulus
    acc, cur = None, 1
    for C in commitments:
        acc = cs.ref.add(acc, cs.ref.mul(cur, C))
        cur = cur * coeff % r
    return acc


def batch_verify_multi_vk(tw, cs: CurveSpec, vks: list, commitments: list,
                          poks: list, coeff: int) -> bool:
    """BatchVerifyMultiVk (pedersen.go:226): n+1 pairings for n proofs.
    All verifying keys must share the same G2 point; poks may be a single
    pre-folded proof."""
    assert len(commitments) == len(vks)
    assert len(poks) in (1, len(vks))
    r = cs.fr.modulus
    for v in vks[1:]:
        if v.g != vks[0].g:
            raise ValueError("parameter mismatch: G2 element")
    for P in commitments + poks:
        if P is not None and cs.ref.mul(r, P) is not None:
            return False                     # subgroup check failed
    g1s, g2s = [commitments[0]], [vks[0].g_sigma_neg]
    cur = coeff % r
    for i in range(1, len(vks)):
        g1s.append(cs.ref.mul(cur, commitments[i]))
        g2s.append(vks[i].g_sigma_neg)
        if i + 1 < len(vks):
            cur = cur * coeff % r
    folded_pok = poks[0] if len(poks) == 1 else fold_commitments(
        cs, poks, coeff)
    g1s.append(folded_pok)
    g2s.append(vks[0].g)
    p_dev = gp.affine_from_ints(cs, g1s)
    q_dev = g2_from_ints(tw, g2s)
    return bool(np.asarray(pairing_check(tw, p_dev, q_dev)))


def verify(tw, cs: CurveSpec, vk: VerifyingKey, commitment: tuple, pok: tuple) -> bool:
    """Verify (pedersen.go:160): e(commit, G^sigma)... folded as
    e(commitment, g) * e(pok, gSigmaNeg)... == 1, i.e.
    e(commitment, [sigma]G2) == e(pok, G2) <=> e(pok, G)*e(commitment, -..)."""
    # check: e(commitment_sigma, G) == e(commitment, G_sigma)
    # gnark form: e(pok, G) * e(commitment, GSigmaNeg) == 1
    p_dev = gp.affine_from_ints(cs, [pok, commitment])
    q_dev = g2_from_ints(tw, [vk.g, vk.g_sigma_neg])
    return bool(np.asarray(pairing_check(tw, p_dev, q_dev)))
