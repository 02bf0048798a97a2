"""SHPLONK batch opening (BDFG20): many polynomials, each at its own point
set, one quotient commitment + one pairing verification.

Mirrors ecc/bn254/shplonk/shplonk.go (BatchOpen :44, BatchVerify :179,
interpolate :391, vanishing poly :381, div :452).  Small per-set polynomial
algebra (interpolation, vanishing) is host big-int math; the degree-N work
(linear-factor divisions, MSM commits) is device."""

from __future__ import annotations

import dataclasses
import hashlib

import jax.numpy as jnp

from ..curves import point as gp
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fields.reference import PF
from ..towers.reference import twist_curve
from ..pairing import g2_from_ints, pairing_check
from . import kzg


@dataclasses.dataclass
class ShplonkProof:
    w: tuple                 # commitment to the first quotient
    w_prime: tuple           # commitment to the second quotient
    claimed_values: list     # r_i values: list (per poly) of list (per point)


def _interp(pf: PF, xs: list[int], ys: list[int]) -> list[int]:
    """Lagrange interpolation -> dense coefficients (host; |xs| tiny)."""
    n = len(xs)
    coeffs = [0] * n
    for i in range(n):
        # basis poly prod_{j!=i} (X - xj)/(xi - xj)
        basis = [1]
        den = 1
        for j in range(n):
            if j == i:
                continue
            basis = _polymul(pf, basis, [(-xs[j]) % pf.q, 1])
            den = den * (xs[i] - xs[j]) % pf.q
        scale = ys[i] * pf.inv(den) % pf.q
        for k, c in enumerate(basis):
            coeffs[k] = (coeffs[k] + scale * c) % pf.q
    return coeffs


def _polymul(pf: PF, a: list[int], b: list[int]) -> list[int]:
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % pf.q
    return out


def _vanishing(pf: PF, xs: list[int]) -> list[int]:
    v = [1]
    for x in xs:
        v = _polymul(pf, v, [(-x) % pf.q, 1])
    return v


def _poly_eval(pf: PF, coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % pf.q
    return acc


def _sub_host_poly(cs, poly, coeffs_host):
    """device poly minus a small host polynomial (aligned low degrees)."""
    fr = cs.fr
    k = len(coeffs_host)
    small = mont.from_ints(fr, coeffs_host)
    head = mont.sub(fr, poly[:, :k], small)
    return jnp.concatenate([head, poly[:, k:]], axis=1)


def _div_linear(cs, poly, a: int):
    """Exact division by (X - a) on device (poly must vanish at a)."""
    return kzg._quotient(cs, poly, a, 0)


def _derive(tag: bytes, items) -> int:
    h = hashlib.sha256()
    h.update(tag)
    for it in items:
        h.update(str(it).encode())
    return int.from_bytes(h.digest(), "big")


def batch_open(cs: CurveSpec, pk: kzg.ProvingKey, polys: list, point_sets:
               list[list[int]], digests: list) -> ShplonkProof:
    """BatchOpen (shplonk.go:44)."""
    fr = cs.fr
    pf = PF(fr.modulus)
    q = fr.modulus
    claimed = []
    r_polys = []
    for p, xs in zip(polys, point_sets):
        ys = [kzg.eval_poly(cs, p, x) for x in xs]
        claimed.append(ys)
        r_polys.append(_interp(pf, xs, ys))
    gamma = _derive(b"gamma", [digests, point_sets, claimed]) % q
    T = sorted({x for xs in point_sets for x in xs})
    # f = sum gamma^i (f_i - r_i) * Z_{T \ S_i};  W = f / Z_T
    # equivalently W = sum gamma^i (f_i - r_i) / Z_{S_i}
    n = max(p.shape[1] for p in polys)
    acc = None
    g = 1
    for p, xs, r in zip(polys, point_sets, r_polys):
        term = _sub_host_poly(cs, p, r)
        for x in xs:
            term = _div_linear(cs, term, x)
        gc = mont.const(fr, g, (1,))
        term = mont.mul(fr, term, gc)
        if term.shape[1] < n:
            term = jnp.concatenate(
                [term, mont.zeros(fr, (n - term.shape[1],))], axis=1
            )
        acc = term if acc is None else mont.add(fr, acc[:, :n], term)
        g = g * gamma % q
    w_com = kzg._to_host_point(cs, kzg.commit(cs, pk, acc))
    z = _derive(b"z", [w_com]) % q
    # L(X) = sum gamma^i Z_{T\S_i}(z) (f_i - r_i(z)) - Z_T(z) W(X);
    # W' = L / (X - z)
    zt = _vanishing(pf, T)
    zt_z = _poly_eval(pf, zt, z)
    L = mont.mul(fr, acc, mont.const(fr, (-zt_z) % q, (1,)))
    g = 1
    for p, xs, r in zip(polys, point_sets, r_polys):
        zt_minus = _vanishing(pf, [x for x in T if x not in xs])
        coeff = _poly_eval(pf, zt_minus, z) * g % q
        riz = _poly_eval(pf, r, z)
        term = _sub_host_poly(cs, p, [riz])
        term = mont.mul(fr, term, mont.const(fr, coeff, (1,)))
        if term.shape[1] < L.shape[1]:
            term = jnp.concatenate(
                [term, mont.zeros(fr, (L.shape[1] - term.shape[1],))], axis=1
            )
        L = mont.add(fr, L, term)
        g = g * gamma % q
    w2 = _div_linear(cs, L, z)
    w2_com = kzg._to_host_point(cs, kzg.commit(cs, pk, w2))
    return ShplonkProof(w=w_com, w_prime=w2_com, claimed_values=claimed)


def batch_verify(tw, cs: CurveSpec, vk: kzg.VerifyingKey, digests: list,
                 point_sets: list[list[int]], proof: ShplonkProof) -> bool:
    """BatchVerify (shplonk.go:179): one pairing check."""
    fr = cs.fr
    q = fr.modulus
    pf = PF(q)
    gamma = _derive(b"gamma", [digests, point_sets, proof.claimed_values]) % q
    z = _derive(b"z", [proof.w]) % q
    T = sorted({x for xs in point_sets for x in xs})
    zt_z = _poly_eval(pf, _vanishing(pf, T), z)
    # F = sum gamma^i Z_{T\S_i}(z) (com_i - [r_i(z)]G1) - Z_T(z) com_W
    F = None
    g = 1
    for com, xs, ys in zip(digests, point_sets, proof.claimed_values):
        r = _interp(pf, xs, ys)
        riz = _poly_eval(pf, r, z)
        coeff = _poly_eval(pf, _vanishing(pf, [x for x in T if x not in xs]), z) * g % q
        pt = cs.ref.add(com, cs.ref.mul((-riz) % q, cs.generator))
        F = cs.ref.add(F, cs.ref.mul(coeff, pt))
        g = g * gamma % q
    F = cs.ref.add(F, cs.ref.mul((-zt_z) % q, proof.w))
    # check e(F, G2) * e(-W', [tau - z]G2) == 1
    tc = twist_curve(tw.ts)
    g2, tau_g2 = vk.g2
    shifted = tc.add(tau_g2, tc.mul((-z) % q, g2))
    p_dev = gp.affine_from_ints(cs, [F, cs.ref.neg(proof.w_prime)])
    q_dev = g2_from_ints(tw, [g2, shifted])
    import numpy as np

    return bool(np.asarray(pairing_check(tw, p_dev, q_dev)))
