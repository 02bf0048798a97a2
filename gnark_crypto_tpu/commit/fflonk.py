"""FFLONK: commit to t polynomials as one via g(X) = sum_i f_i(X^t) * X^i,
then batch-open with SHPLONK at the t-th roots of the query points.

Mirrors ecc/bn254/fflonk/fflonk.go (Fold :52, getIthRootOne :213,
BatchOpen :77, BatchVerify :149)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..curves.spec import CurveSpec
from ..fields import mont
from ..fields.reference import PF
from . import kzg, shplonk


def fold(cs: CurveSpec, polys: list) -> jnp.ndarray:
    """g(X) = sum_i f_i(X^t) X^i (Fold, fflonk.go:52): interleave coefficients."""
    fr = cs.fr
    t = len(polys)
    n = max(p.shape[1] for p in polys)
    out = mont.zeros(fr, (n * t,))
    for i, p in enumerate(polys):
        padded = p
        if p.shape[1] < n:
            padded = jnp.concatenate(
                [p, mont.zeros(fr, (n - p.shape[1],))], axis=1
            )
        out = out.at[:, i::t].set(padded)
    return out


def _t_th_roots(pf: PF, x: int, t: int, gen: int) -> list[int]:
    """All t-th roots of x in F_q (t a power of two dividing q-1): one root by
    iterated sqrt, the rest via a primitive t-th root of unity
    (getIthRootOne, fflonk.go:213).  gen: generator of F_q^*."""
    q = pf.q
    assert (q - 1) % t == 0
    mu = pow(gen, (q - 1) // t, q)  # primitive t-th root of unity
    r = x
    tt = t
    while tt > 1:
        assert tt % 2 == 0, "t must be a power of two"
        s = pf.sqrt(r)
        assert s is not None, "x must be a t-th power residue"
        r = s
        tt //= 2
    roots = []
    cur = r
    for _ in range(t):
        roots.append(cur)
        cur = cur * mu % q
    return roots


@dataclasses.dataclass
class FflonkProof:
    inner: shplonk.ShplonkProof
    t: int


def batch_open(cs: CurveSpec, pk: kzg.ProvingKey, polys: list, point: int,
               digest) -> FflonkProof:
    """BatchOpen (fflonk.go:77): open the folded poly at the t t-th roots of
    `point` — the values encode every f_i(point-related) evaluation."""
    pf = PF(cs.fr.modulus)
    t = len(polys)
    g = fold(cs, polys)
    roots = _t_th_roots(pf, point, t, cs.fr.multiplicative_generator)
    proof = shplonk.batch_open(cs, pk, [g], [roots], [digest])
    return FflonkProof(inner=proof, t=t)


def batch_verify(tw, cs: CurveSpec, vk: kzg.VerifyingKey, digest, point: int,
                 proof: FflonkProof) -> bool:
    """BatchVerify (fflonk.go:149)."""
    pf = PF(cs.fr.modulus)
    roots = _t_th_roots(pf, point, proof.t, cs.fr.multiplicative_generator)
    return shplonk.batch_verify(tw, cs, vk, [digest], [roots], proof.inner)
