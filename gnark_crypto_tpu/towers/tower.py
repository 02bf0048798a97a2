"""Batched device arithmetic for the extension towers Fp2 / Fp6 / Fp12.

TPU counterpart of ecc/<curve>/internal/fptower/ (e2.go, e6.go, e12.go): fixed
small structs of field *vectors* (SURVEY.md §7 S6), one NamedTuple level per
tower floor.  All ops broadcast over the batch like fields.mont.

Tower shape (matches the reference):
  Fp2  = Fp[u]/(u^2 - u2)
  Fp6  = Fp2[v]/(v^3 - xi)
  Fp12 = Fp6[w]/(w^2 - v)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.spec import FieldSpec
from .reference import E2 as RefE2, TowerSpec


class E2(NamedTuple):
    a0: jax.Array
    a1: jax.Array


class E6(NamedTuple):
    b0: E2
    b1: E2
    b2: E2


class E12(NamedTuple):
    c0: E6
    c1: E6


@dataclasses.dataclass(frozen=True)
class Tower:
    """Static context: field spec + tower constants (one per curve)."""

    fp: FieldSpec
    ts: TowerSpec

    # ---- E2 ---------------------------------------------------------------

    def e2_add(self, a: E2, b: E2) -> E2:
        f = self.fp
        return E2(mont.add(f, a.a0, b.a0), mont.add(f, a.a1, b.a1))

    def e2_sub(self, a: E2, b: E2) -> E2:
        f = self.fp
        return E2(mont.sub(f, a.a0, b.a0), mont.sub(f, a.a1, b.a1))

    def e2_neg(self, a: E2) -> E2:
        f = self.fp
        return E2(mont.neg(f, a.a0), mont.neg(f, a.a1))

    def e2_double(self, a: E2) -> E2:
        f = self.fp
        return E2(mont.double(f, a.a0), mont.double(f, a.a1))

    def e2_conj(self, a: E2) -> E2:
        return E2(a.a0, mont.neg(self.fp, a.a1))

    def _u2_mul(self, x):
        """x * u2 where u2 is a small negative int (-1 or -5)."""
        f = self.fp
        return mont.neg(f, mont.mul_const(f, x, -self.ts.u2))

    def e2_mul(self, a: E2, b: E2) -> E2:
        """Karatsuba (e2.go Mul): 3 Fp muls."""
        f = self.fp
        t0 = mont.mul(f, a.a0, b.a0)
        t1 = mont.mul(f, a.a1, b.a1)
        t2 = mont.mul(f, mont.add(f, a.a0, a.a1), mont.add(f, b.a0, b.a1))
        c0 = mont.add(f, t0, self._u2_mul(t1))
        c1 = mont.sub(f, mont.sub(f, t2, t0), t1)
        return E2(c0, c1)

    def e2_square(self, a: E2) -> E2:
        f = self.fp
        if self.ts.u2 == -1:  # complex squaring: (a0+a1)(a0-a1), 2a0a1
            c0 = mont.mul(f, mont.add(f, a.a0, a.a1), mont.sub(f, a.a0, a.a1))
            c1 = mont.double(f, mont.mul(f, a.a0, a.a1))
            return E2(c0, c1)
        return self.e2_mul(a, a)

    def e2_mul_by_fp(self, a: E2, s: jax.Array) -> E2:
        f = self.fp
        return E2(mont.mul(f, a.a0, s), mont.mul(f, a.a1, s))

    def e2_mul_small(self, a: E2, k: int) -> E2:
        f = self.fp
        return E2(mont.mul_const(f, a.a0, k), mont.mul_const(f, a.a1, k))

    def e2_mul_xi(self, a: E2) -> E2:
        """a * xi with xi = xi0 + xi1*u (small ints): (xi0 a0 + u2 xi1 a1,
        xi0 a1 + xi1 a0)."""
        f = self.fp
        x0, x1 = self.ts.xi
        c0 = mont.mul_const(f, a.a0, x0)
        if x1:
            c0 = mont.add(f, c0, self._u2_mul(mont.mul_const(f, a.a1, x1)))
        c1 = mont.mul_const(f, a.a1, x0)
        if x1:
            c1 = mont.add(f, c1, mont.mul_const(f, a.a0, x1))
        return E2(c0, c1)

    def e2_inverse(self, a: E2) -> E2:
        f = self.fp
        d = mont.sub(f, mont.square(f, a.a0), self._u2_mul(mont.square(f, a.a1)))
        di = mont.inverse(f, d)
        return E2(mont.mul(f, a.a0, di), mont.neg(f, mont.mul(f, a.a1, di)))

    def e2_is_zero(self, a: E2):
        f = self.fp
        return jnp.logical_and(mont.is_zero(f, a.a0), mont.is_zero(f, a.a1))

    def e2_eq(self, a: E2, b: E2):
        f = self.fp
        return jnp.logical_and(mont.eq(f, a.a0, b.a0), mont.eq(f, a.a1, b.a1))

    def e2_select(self, m, a: E2, b: E2) -> E2:
        return E2(mont.select(m, a.a0, b.a0), mont.select(m, a.a1, b.a1))

    def e2_zero(self, batch=()) -> E2:
        f = self.fp
        return E2(mont.zeros(f, batch), mont.zeros(f, batch))

    def e2_one(self, batch=()) -> E2:
        f = self.fp
        return E2(mont.one(f, batch), mont.zeros(f, batch))

    def e2_const(self, val: tuple[int, int], batch=()) -> E2:
        f = self.fp
        return E2(mont.const(f, val[0], batch), mont.const(f, val[1], batch))

    def e2_from_ints(self, vals) -> E2:
        """vals: sequence of (a0, a1) int pairs."""
        f = self.fp
        return E2(
            mont.from_ints(f, [v[0] for v in vals]),
            mont.from_ints(f, [v[1] for v in vals]),
        )

    def e2_to_ints(self, a: E2):
        f = self.fp
        a0 = mont.to_ints(f, a.a0)
        a1 = mont.to_ints(f, a.a1)
        out = np.empty(a0.shape, dtype=object)
        it = np.nditer(a0, flags=["multi_index", "refs_ok"])
        for _ in it:
            i = it.multi_index
            out[i] = (int(a0[i]), int(a1[i]))
        return out

    # ---- E6 ---------------------------------------------------------------

    def e6_add(self, a: E6, b: E6) -> E6:
        return E6(*(self.e2_add(x, y) for x, y in zip(a, b)))

    def e6_sub(self, a: E6, b: E6) -> E6:
        return E6(*(self.e2_sub(x, y) for x, y in zip(a, b)))

    def e6_neg(self, a: E6) -> E6:
        return E6(*(self.e2_neg(x) for x in a))

    def e6_mul(self, a: E6, b: E6) -> E6:
        """Toom/Karatsuba interpolation (e6.go Mul): 6 E2 muls."""
        t0 = self.e2_mul(a.b0, b.b0)
        t1 = self.e2_mul(a.b1, b.b1)
        t2 = self.e2_mul(a.b2, b.b2)
        c0 = self.e2_add(
            t0,
            self.e2_mul_xi(
                self.e2_sub(
                    self.e2_mul(self.e2_add(a.b1, a.b2), self.e2_add(b.b1, b.b2)),
                    self.e2_add(t1, t2),
                )
            ),
        )
        c1 = self.e2_add(
            self.e2_sub(
                self.e2_mul(self.e2_add(a.b0, a.b1), self.e2_add(b.b0, b.b1)),
                self.e2_add(t0, t1),
            ),
            self.e2_mul_xi(t2),
        )
        c2 = self.e2_add(
            self.e2_sub(
                self.e2_mul(self.e2_add(a.b0, a.b2), self.e2_add(b.b0, b.b2)),
                self.e2_add(t0, t2),
            ),
            t1,
        )
        return E6(c0, c1, c2)

    def e6_square(self, a: E6) -> E6:
        return self.e6_mul(a, a)

    def e6_mul_by_v(self, a: E6) -> E6:
        return E6(self.e2_mul_xi(a.b2), a.b0, a.b1)

    def e6_mul_by_e2(self, a: E6, s: E2) -> E6:
        return E6(self.e2_mul(a.b0, s), self.e2_mul(a.b1, s), self.e2_mul(a.b2, s))

    def e6_inverse(self, a: E6) -> E6:
        e2 = self
        t0 = e2.e2_square(a.b0)
        t1 = e2.e2_square(a.b1)
        t2 = e2.e2_square(a.b2)
        t3 = e2.e2_mul(a.b0, a.b1)
        t4 = e2.e2_mul(a.b0, a.b2)
        t5 = e2.e2_mul(a.b1, a.b2)
        c0 = e2.e2_sub(t0, e2.e2_mul_xi(t5))
        c1 = e2.e2_sub(e2.e2_mul_xi(t2), t3)
        c2 = e2.e2_sub(t1, t4)
        t6 = e2.e2_add(
            e2.e2_mul(a.b0, c0),
            e2.e2_mul_xi(e2.e2_add(e2.e2_mul(a.b2, c1), e2.e2_mul(a.b1, c2))),
        )
        t6i = e2.e2_inverse(t6)
        return E6(e2.e2_mul(c0, t6i), e2.e2_mul(c1, t6i), e2.e2_mul(c2, t6i))

    def e6_zero(self, batch=()) -> E6:
        z = self.e2_zero(batch)
        return E6(z, z, z)

    def e6_one(self, batch=()) -> E6:
        return E6(self.e2_one(batch), self.e2_zero(batch), self.e2_zero(batch))

    def e6_select(self, m, a: E6, b: E6) -> E6:
        return E6(*(self.e2_select(m, x, y) for x, y in zip(a, b)))

    # ---- E12 --------------------------------------------------------------

    def e12_add(self, a: E12, b: E12) -> E12:
        return E12(self.e6_add(a.c0, b.c0), self.e6_add(a.c1, b.c1))

    def e12_sub(self, a: E12, b: E12) -> E12:
        return E12(self.e6_sub(a.c0, b.c0), self.e6_sub(a.c1, b.c1))

    def e12_mul(self, a: E12, b: E12) -> E12:
        t0 = self.e6_mul(a.c0, b.c0)
        t1 = self.e6_mul(a.c1, b.c1)
        c0 = self.e6_add(t0, self.e6_mul_by_v(t1))
        c1 = self.e6_sub(
            self.e6_sub(
                self.e6_mul(self.e6_add(a.c0, a.c1), self.e6_add(b.c0, b.c1)), t0
            ),
            t1,
        )
        return E12(c0, c1)

    def e12_square(self, a: E12) -> E12:
        return self.e12_mul(a, a)

    def e12_conj(self, a: E12) -> E12:
        return E12(a.c0, self.e6_neg(a.c1))

    def e12_inverse(self, a: E12) -> E12:
        d = self.e6_sub(self.e6_square(a.c0), self.e6_mul_by_v(self.e6_square(a.c1)))
        di = self.e6_inverse(d)
        return E12(self.e6_mul(a.c0, di), self.e6_neg(self.e6_mul(a.c1, di)))

    def e12_zero(self, batch=()) -> E12:
        return E12(self.e6_zero(batch), self.e6_zero(batch))

    def e12_one(self, batch=()) -> E12:
        return E12(self.e6_one(batch), self.e6_zero(batch))

    def e12_select(self, m, a: E12, b: E12) -> E12:
        return E12(self.e6_select(m, a.c0, b.c0), self.e6_select(m, a.c1, b.c1))

    def e12_is_one(self, a: E12):
        f = self.fp
        one = self.e12_one(a.c0.b0.a0.shape[1:])
        acc = None
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(one)):
            e = mont.eq(f, x, y)
            acc = e if acc is None else jnp.logical_and(acc, e)
        return acc

    def e12_eq(self, a: E12, b: E12):
        f = self.fp
        acc = None
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            e = mont.eq(f, x, y)
            acc = e if acc is None else jnp.logical_and(acc, e)
        return acc

    # w-coefficient view: x = sum_k coef_k(E2) * w^k, k = 0..5
    def _coeffs(self, a: E12) -> list[E2]:
        return [a.c0.b0, a.c1.b0, a.c0.b1, a.c1.b1, a.c0.b2, a.c1.b2]

    def _from_coeffs(self, c: list[E2]) -> E12:
        return E12(E6(c[0], c[2], c[4]), E6(c[1], c[3], c[5]))

    def e12_sparse(self, entries: dict[int, E2], batch=()) -> E12:
        """Build an E12 from a {w_power: E2} dict (for line evaluations)."""
        c = [self.e2_zero(batch) for _ in range(6)]
        for k, v in entries.items():
            c[k] = v
        return self._from_coeffs(c)

    def _e6_mul_sparse(self, a: E6, d: tuple) -> E6:
        """a * (d0 + d1 v + d2 v^2) with None entries structurally zero:
        schoolbook over the nonzero coefficients (<= 2 nonzero: <= 6 E2 muls,
        beating the 6-mul Karatsuba only by the skipped add chains; the win
        is at 1 nonzero: 3 muls)."""
        nz = [(i, di) for i, di in enumerate(d) if di is not None]
        if len(nz) == 3:
            return self.e6_mul(a, E6(*d))
        acc = [None, None, None]   # v-power accumulators, pre-xi fold
        for i, di in nz:
            for j, bj in enumerate((a.b0, a.b1, a.b2)):
                p = self.e2_mul(bj, di)
                k = i + j
                if k >= 3:
                    p = self.e2_mul_xi(p)
                    k -= 3
                acc[k] = p if acc[k] is None else self.e2_add(acc[k], p)
        batch = a.b0.a0.shape[1:]
        return E6(*(x if x is not None else self.e2_zero(batch)
                    for x in acc))

    def e12_mul_line(self, a: E12, line: E12) -> E12:
        """a * line for a sparse line evaluation (MulBy034 / MulBy014
        analogue, fptower/e12_pairing.go:136): the line has 3 nonzero
        w-coefficients ({w^0,w^1,w^3} D-twist, {w^0,w^3,w^5} M-twist), so the
        Karatsuba sub-products use sparse E6 muls — 15 E2 muls vs 18."""
        if self.ts.twist == "D":
            # line.c0 = (d0, 0, 0); line.c1 = (d1, d3, 0)
            l00, l10, l11 = line.c0.b0, line.c1.b0, line.c1.b1
            t0 = self.e6_mul_by_e2(a.c0, l00)
            t1 = self._e6_mul_sparse(a.c1, (l10, l11, None))
            mid = self._e6_mul_sparse(
                self.e6_add(a.c0, a.c1),
                (self.e2_add(l00, l10), l11, None))
        else:
            # line.c0 = (d0, 0, 0); line.c1 = (0, d3, d5)
            l00, l11, l12 = line.c0.b0, line.c1.b1, line.c1.b2
            t0 = self.e6_mul_by_e2(a.c0, l00)
            t1 = self._e6_mul_sparse(a.c1, (None, l11, l12))
            mid = self._e6_mul_sparse(
                self.e6_add(a.c0, a.c1), (l00, l11, l12))
        c0 = self.e6_add(t0, self.e6_mul_by_v(t1))
        c1 = self.e6_sub(self.e6_sub(mid, t0), t1)
        return E12(c0, c1)

    @functools.cache
    def _frob_gammas(self, power: int) -> list[tuple[int, int]]:
        """gamma^k = xi^(k*(p^power - 1)/6) as host E2 constants, k=0..5."""
        e2 = RefE2(self.ts)
        p = self.ts.p
        g = e2.pow((self.ts.xi[0] % p, self.ts.xi[1] % p), (p**power - 1) // 6)
        out = [(1, 0)]
        for _ in range(5):
            out.append(e2.mul(out[-1], g))
        return out

    def e12_frobenius(self, a: E12, power: int = 1) -> E12:
        """x -> x^(p^power) (e12.go Frobenius/FrobeniusSquare/FrobeniusCube):
        conjugate Fp2 coefficients (odd powers) and scale coef_k by gamma^k."""
        assert power in (1, 2, 3)
        batch = a.c0.b0.a0.shape[1:]
        gammas = self._frob_gammas(power)
        cs = self._coeffs(a)
        out = []
        for k, c in enumerate(cs):
            if power % 2 == 1:
                c = self.e2_conj(c)
            if gammas[k] != (1, 0):
                c = self.e2_mul(c, self.e2_const(gammas[k], ()))
            out.append(c)
        del batch
        return self._from_coeffs(out)

    def e12_pow(self, a: E12, e: int) -> E12:
        """Fixed host-int exponent, lax.scan square-and-multiply (trace holds
        2 E12 muls regardless of exponent length)."""
        if e < 0:
            return self.e12_pow(self.e12_conj(a), -e)  # valid on cyclotomic elts
        if e == 0:
            return self.e12_one(a.c0.b0.a0.shape[1:])
        bits = bin(e)[2:]
        if len(bits) <= 4:
            r = a
            for bit in bits[1:]:
                r = self.e12_square(r)
                if bit == "1":
                    r = self.e12_mul(r, a)
            return r
        bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

        def body(res, bit):
            res = self.e12_square(res)
            res = self.e12_select(
                jnp.broadcast_to(bit, res.c0.b0.a0.shape[1:]),
                self.e12_mul(res, a),
                res,
            )
            return res, None

        r, _ = jax.lax.scan(body, a, bit_arr)
        return r

    # cyclotomic subgroup: after the easy part x^(p^6) = conj(x) = x^(-1)
    def e12_cyclotomic_inverse(self, a: E12) -> E12:
        return self.e12_conj(a)

    # ---- conversions vs the host oracle representation --------------------

    def e12_from_oracle(self, vals) -> E12:
        """vals: sequence of oracle E12 elements ((e2,e2,e2),(e2,e2,e2))."""
        def grab(path):
            return [functools.reduce(lambda x, i: x[i], path, v) for v in vals]

        return E12(
            E6(*(self.e2_from_ints(grab((0, i))) for i in range(3))),
            E6(*(self.e2_from_ints(grab((1, i))) for i in range(3))),
        )

    def e12_to_oracle(self, a: E12):
        sixes = []
        for c6 in (a.c0, a.c1):
            pairs = [self.e2_to_ints(x) for x in c6]
            sixes.append(pairs)
        shape = sixes[0][0].shape
        out = np.empty(shape, dtype=object)
        it = np.nditer(sixes[0][0], flags=["multi_index", "refs_ok"])
        for _ in it:
            i = it.multi_index
            out[i] = (
                (sixes[0][0][i], sixes[0][1][i], sixes[0][2][i]),
                (sixes[1][0][i], sixes[1][1][i], sixes[1][2][i]),
            )
        return out


@functools.cache
def tower(curve_name: str) -> Tower:
    from ..curves import spec as cspec
    from .reference import bls12_377_tower, bls12_381_tower, bn254_tower

    ts = {
        "bn254": bn254_tower,
        "bls12_381": bls12_381_tower,
        "bls12_377": bls12_377_tower,
    }[curve_name]()
    cs = getattr(cspec, curve_name)()
    return Tower(fp=cs.fp, ts=ts)
