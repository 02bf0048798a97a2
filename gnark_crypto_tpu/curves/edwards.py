"""Twisted Edwards companion curves (a x^2 + y^2 = 1 + d x^2 y^2 over the
SNARK curve's fr) — analogue of ecc/<curve>/twistededwards/{curve,point}.go.

Device ops use unified projective formulas (add-2008-bbjlp), complete when a
is a square and d a non-square (checked at construction), so one batched op
covers add/double/identity — no branches.  A host int oracle (`EdOracle`)
mirrors every op for tests and scalar protocol glue (EdDSA)."""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.fields import get_spec
from ..fields.reference import PF
from ..fields.spec import LIMB_BITS, FieldSpec
import numpy as np


@dataclasses.dataclass(frozen=True)
class EdwardsSpec:
    name: str
    fr: FieldSpec          # coordinate field
    a: int
    d: int
    order: int             # order of the prime subgroup
    cofactor: int
    bx: int
    by: int

    def __post_init__(self):
        pf = PF(self.fr.modulus)
        assert pf.legendre(self.a) == 1, "a must be a square (completeness)"
        assert pf.legendre(self.d) == -1, "d must be a non-square (completeness)"
        o = EdOracle(self)
        assert o.is_on_curve((self.bx, self.by)), "base point not on curve"
        assert o.mul(self.order, (self.bx, self.by)) == (0, 1), "base point order"


class EdOracle:
    """Host affine oracle; identity = (0, 1)."""

    def __init__(self, es: EdwardsSpec):
        self.es = es
        self.pf = PF(es.fr.modulus)

    def is_on_curve(self, P):
        x, y = P
        p = self.pf
        lhs = p.add(p.mul(self.es.a, p.mul(x, x)), p.mul(y, y))
        rhs = p.add(1, p.mul(self.es.d, p.mul(p.mul(x, x), p.mul(y, y))))
        return lhs == rhs

    def add(self, P, Q):
        p = self.pf
        x1, y1 = P
        x2, y2 = Q
        dxy = p.mul(self.es.d, p.mul(p.mul(x1, x2), p.mul(y1, y2)))
        x3 = p.div(p.add(p.mul(x1, y2), p.mul(y1, x2)), p.add(1, dxy))
        y3 = p.div(p.sub(p.mul(y1, y2), p.mul(self.es.a, p.mul(x1, x2))),
                   p.sub(1, dxy))
        return (x3, y3)

    def neg(self, P):
        return (self.pf.neg(P[0]), P[1])

    def mul(self, k, P):
        if k < 0:
            return self.mul(-k, self.neg(P))
        R, A = (0, 1), P
        while k:
            if k & 1:
                R = self.add(R, A)
            A = self.add(A, A)
            k >>= 1
        return R


class EdProj(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


class EdAffine(NamedTuple):
    x: jax.Array
    y: jax.Array


def ed_from_ints(es: EdwardsSpec, pts) -> EdAffine:
    f = es.fr
    return EdAffine(
        mont.from_ints(f, [P[0] for P in pts]),
        mont.from_ints(f, [P[1] for P in pts]),
    )


def ed_to_ints(es: EdwardsSpec, a: EdAffine):
    f = es.fr
    xs, ys = mont.to_ints(f, a.x), mont.to_ints(f, a.y)
    out = np.empty(xs.shape, dtype=object)
    it = np.nditer(xs, flags=["multi_index", "refs_ok"])
    for _ in it:
        i = it.multi_index
        out[i] = (int(xs[i]), int(ys[i]))
    return out


def ed_identity(es: EdwardsSpec, batch=()) -> EdProj:
    f = es.fr
    return EdProj(mont.zeros(f, batch), mont.one(f, batch), mont.one(f, batch))


def ed_from_affine(es: EdwardsSpec, a: EdAffine) -> EdProj:
    return EdProj(a.x, a.y, mont.one(es.fr, a.x.shape[1:]))


def ed_to_affine(es: EdwardsSpec, p: EdProj) -> EdAffine:
    f = es.fr
    zflat = p.z.reshape(f.n_limbs, -1)
    zinv = mont.batch_inverse(f, zflat, axis=1).reshape(p.z.shape)
    return EdAffine(mont.mul(f, p.x, zinv), mont.mul(f, p.y, zinv))


def ed_add(es: EdwardsSpec, p: EdProj, q: EdProj) -> EdProj:
    """Unified projective addition (add-2008-bbjlp) — complete."""
    f = es.fr
    A = mont.mul(f, p.z, q.z)
    B = mont.square(f, A)
    C = mont.mul(f, p.x, q.x)
    D = mont.mul(f, p.y, q.y)
    E = mont.mul_const(f, mont.mul(f, C, D), es.d)
    F = mont.sub(f, B, E)
    G = mont.add(f, B, E)
    xsum = mont.mul(f, mont.add(f, p.x, p.y), mont.add(f, q.x, q.y))
    x3 = mont.mul(f, mont.mul(f, A, F), mont.sub(f, mont.sub(f, xsum, C), D))
    y3 = mont.mul(f, mont.mul(f, A, G), mont.sub(f, D, mont.mul_const(f, C, es.a)))
    z3 = mont.mul(f, F, G)
    return EdProj(x3, y3, z3)


def ed_scalar_mul(es: EdwardsSpec, base: EdProj, scalars: jax.Array) -> EdProj:
    """Batched double-and-add; scalars: plain limb arrays over any modulus
    window (ScalarMultiplication, twistededwards/point.go:414)."""
    f = es.fr
    nbits = scalars.shape[0] * LIMB_BITS
    limb_idx = np.array([(nbits - 1 - i) // LIMB_BITS for i in range(nbits)], np.int32)
    shift = np.array([(nbits - 1 - i) % LIMB_BITS for i in range(nbits)], np.int32)
    acc0 = ed_identity(es, base.x.shape[1:])

    def body(acc, xs):
        li, sh = xs
        acc = ed_add(es, acc, acc)
        bit = (scalars[li] >> sh.astype(jnp.uint32)) & 1
        added = ed_add(es, acc, base)
        m = bit == 1
        acc = EdProj(
            mont.select(m, added.x, acc.x),
            mont.select(m, added.y, acc.y),
            mont.select(m, added.z, acc.z),
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(limb_idx), jnp.asarray(shift)))
    return acc


# ---------------------------------------------------------------------------
# named instances (internal/generator/config/*.go twisted-Edwards params)
# ---------------------------------------------------------------------------


@functools.cache
def bn254_edwards() -> EdwardsSpec:
    # config/bn254.go:60-69 (tBN254, "Baby-Jubjub"-style companion)
    return EdwardsSpec(
        name="bn254_edwards",
        fr=get_spec("bn254_fr"),
        a=-1 % get_spec("bn254_fr").modulus,
        d=12181644023421730124874158521699555681764249180949974110617291017600649128846,
        order=2736030358979909402780800718157159386076813972158567259200215660948447373041,
        cofactor=8,
        bx=9671717474070082183213120605117400219616337014328744928644933853176787189663,
        by=16950150798460657717958625567821834550301663161624707787222815936182638968203,
    )
