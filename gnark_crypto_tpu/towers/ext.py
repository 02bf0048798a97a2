"""Generic device extension-tower arithmetic on FLAT limb arrays.

An element of a degree-d extension stack lives in a single uint32 array of
shape (L, *batch) with L = d_abs * n_limbs — the concatenation of the Fp
coefficient limb blocks in tower order.  This makes every extension field
"just a bigger field" to downstream code: the Weierstrass group law, MSM
scatter/gather and serialization in curves/ operate on (L, *batch) arrays
without knowing the tower shape, which is how G2 (coordinates in Fp2 / Fp4 /
Fp for BW6) reuses the G1 machinery verbatim.

TPU counterpart of the reference's per-curve fptower packages
(ecc/bls24-315/internal/fptower/e4.go, ecc/bw6-761/internal/fptower/e3.go,
...), replacing generated Go types with trace-time specialization over an
`Ops` object (mirrors how fields/spec.py replaces goff).

Ops objects are frozen dataclasses (hashable) so they can be static args
under jit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.spec import FieldSpec
from .host import HostExt, HostPrime


@dataclasses.dataclass(frozen=True)
class PrimeOps:
    """Fp as a degree-1 'tower' — adapts fields.mont to the Ops protocol."""

    spec: FieldSpec

    @property
    def L(self) -> int:
        return self.spec.n_limbs

    @property
    def p(self) -> int:
        return self.spec.modulus

    @functools.cached_property
    def host(self) -> HostPrime:
        return HostPrime(self.spec.modulus)

    def add(self, a, b):
        return mont.add(self.spec, a, b)

    def sub(self, a, b):
        return mont.sub(self.spec, a, b)

    def neg(self, a):
        return mont.neg(self.spec, a)

    def double(self, a):
        return mont.double(self.spec, a)

    def mul(self, a, b):
        return mont.mul(self.spec, a, b)

    def square(self, a):
        return mont.square(self.spec, a)

    def mul_small(self, a, k: int):
        return mont.mul_const(self.spec, a, k)

    def mul_fp(self, a, s):
        """Multiply by an Fp element s of shape (n_limbs, *batch)."""
        return mont.mul(self.spec, a, s)

    def inverse(self, a):
        return mont.inverse(self.spec, a)

    def is_zero(self, a):
        return mont.is_zero(self.spec, a)

    def eq(self, a, b):
        return mont.eq(self.spec, a, b)

    def select(self, m, a, b):
        return mont.select(m, a, b)

    def zeros(self, batch=()):
        return mont.zeros(self.spec, batch)

    def one(self, batch=()):
        return mont.one(self.spec, batch)

    def const(self, host_val, batch=()):
        """Broadcast a host element (int) in Montgomery form."""
        return mont.const(self.spec, host_val, batch)

    def frobenius(self, a, i: int = 1):
        return a

    def conj(self, a):
        return a

    def from_ints(self, vals):
        return mont.from_ints(self.spec, vals)

    def to_ints(self, a):
        return mont.to_ints(self.spec, a)

    def rand_host(self, rng):
        return self.host.rand(rng)


def _is_small_int(x) -> bool:
    return isinstance(x, int) and abs(x) <= 16


@dataclasses.dataclass(frozen=True)
class ExtOps:
    """K = B[w]/(w^d - nr) on flat (d*B.L, *batch) arrays.

    `nr` is a HOST element of the base field (int or nested tuple).  Fast
    paths: small-int nr -> mul_small; nr == c*w_base (pure generator multiple)
    -> base rotation; general nr -> constant multiplication.
    """

    base: object           # PrimeOps | ExtOps
    d: int                 # 2 or 3
    nr: object             # host base element (int or nested tuple)
    name: str = ""

    def __post_init__(self):
        assert self.d in (2, 3)

    @property
    def L(self) -> int:
        return self.base.L * self.d

    @property
    def p(self) -> int:
        return self.base.p

    @property
    def spec(self) -> FieldSpec:
        """The underlying prime-field spec (limb layout)."""
        return self._prime.spec

    @property
    def _prime(self) -> PrimeOps:
        b = self.base
        while isinstance(b, ExtOps):
            b = b.base
        return b

    @functools.cached_property
    def host(self) -> HostExt:
        return HostExt(self.base.host, self.d, self.nr, self.name)

    # ---- flat <-> component views -------------------------------------------

    def split(self, a):
        bl = self.base.L
        return [a[k * bl:(k + 1) * bl] for k in range(self.d)]

    def join(self, comps):
        return jnp.concatenate(list(comps), axis=0)

    # ---- nonresidue multiplication ------------------------------------------

    @functools.cached_property
    def _nr_kind(self) -> str:
        nr = self.nr
        if _is_small_int(nr):
            return "small"
        if isinstance(self.base, ExtOps):
            bh = self.base.host
            if bh.eq(nr, bh.gen()):
                return "gen"  # nr = w_base: rotation, no base mul
        return "general"

    def mul_nr(self, x):
        """x * nr on base elements (x: (B.L, *batch))."""
        kind = self._nr_kind
        if kind == "small":
            if self.nr < 0:  # -1/-4/-5 etc.: tiny positive mul then negate
                return self.base.neg(self.base.mul_small(x, -self.nr))
            return self.base.mul_small(x, self.nr)
        if kind == "gen":
            return self.base.mul_gen(x)
        return self.base.mul(x, self.base.const(self.nr, ()))

    def mul_gen(self, a):
        """a * w (generator of THIS extension): rotate + mul_nr."""
        c = self.split(a)
        return self.join([self.mul_nr(c[-1])] + c[:-1])

    # ---- ring ops ------------------------------------------------------------

    def add(self, a, b):
        return self.join(
            self.base.add(x, y) for x, y in zip(self.split(a), self.split(b)))

    def sub(self, a, b):
        return self.join(
            self.base.sub(x, y) for x, y in zip(self.split(a), self.split(b)))

    def neg(self, a):
        return self.join(self.base.neg(x) for x in self.split(a))

    def double(self, a):
        return self.join(self.base.double(x) for x in self.split(a))

    def mul(self, a, b):
        B = self.base
        x, y = self.split(a), self.split(b)
        if self.d == 2:
            t0 = B.mul(x[0], y[0])
            t1 = B.mul(x[1], y[1])
            t2 = B.mul(B.add(x[0], x[1]), B.add(y[0], y[1]))
            return self.join([
                B.add(t0, self.mul_nr(t1)),
                B.sub(B.sub(t2, t0), t1),
            ])
        t0 = B.mul(x[0], y[0])
        t1 = B.mul(x[1], y[1])
        t2 = B.mul(x[2], y[2])
        c0 = B.add(t0, self.mul_nr(B.sub(
            B.mul(B.add(x[1], x[2]), B.add(y[1], y[2])), B.add(t1, t2))))
        c1 = B.add(B.sub(
            B.mul(B.add(x[0], x[1]), B.add(y[0], y[1])), B.add(t0, t1)),
            self.mul_nr(t2))
        c2 = B.add(B.sub(
            B.mul(B.add(x[0], x[2]), B.add(y[0], y[2])), B.add(t0, t2)), t1)
        return self.join([c0, c1, c2])

    def square(self, a):
        if self.d == 2:
            B = self.base
            x = self.split(a)
            # complex-style squaring when nr supports it cheaply
            t = B.mul(x[0], x[1])
            c0 = B.sub(
                B.mul(B.add(x[0], x[1]), B.add(x[0], self.mul_nr(x[1]))),
                B.add(t, self.mul_nr(t)),
            )
            return self.join([c0, B.double(t)])
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        return self.join(self.base.mul_small(x, k) for x in self.split(a))

    def mul_fp(self, a, s):
        return self.join(self.base.mul_fp(x, s) for x in self.split(a))

    def mul_base(self, a, s):
        """Multiply by a base element s of shape (B.L, *batch)."""
        return self.join(self.base.mul(x, s) for x in self.split(a))

    def conj(self, a):
        assert self.d == 2
        c = self.split(a)
        return self.join([c[0], self.base.neg(c[1])])

    def inverse(self, a):
        B = self.base
        x = self.split(a)
        if self.d == 2:
            den = B.sub(B.square(x[0]), self.mul_nr(B.square(x[1])))
            di = B.inverse(den)
            return self.join([B.mul(x[0], di), B.neg(B.mul(x[1], di))])
        a0, a1, a2 = x
        t0, t1, t2 = B.square(a0), B.square(a1), B.square(a2)
        t3, t4, t5 = B.mul(a0, a1), B.mul(a0, a2), B.mul(a1, a2)
        c0 = B.sub(t0, self.mul_nr(t5))
        c1 = B.sub(self.mul_nr(t2), t3)
        c2 = B.sub(t1, t4)
        t6 = B.add(B.mul(a0, c0),
                   self.mul_nr(B.add(B.mul(a2, c1), B.mul(a1, c2))))
        t6i = B.inverse(t6)
        return self.join([B.mul(c0, t6i), B.mul(c1, t6i), B.mul(c2, t6i)])

    # ---- predicates / structure ----------------------------------------------

    def is_zero(self, a):
        acc = None
        for x in self.split(a):
            z = self.base.is_zero(x)
            acc = z if acc is None else jnp.logical_and(acc, z)
        return acc

    def eq(self, a, b):
        acc = None
        for x, y in zip(self.split(a), self.split(b)):
            e = self.base.eq(x, y)
            acc = e if acc is None else jnp.logical_and(acc, e)
        return acc

    def select(self, m, a, b):
        return mont.select(m, *mont._align(a, b))

    def zeros(self, batch=()):
        return self.join(self.base.zeros(batch) for _ in range(self.d))

    def one(self, batch=()):
        return self.join(
            [self.base.one(batch)]
            + [self.base.zeros(batch) for _ in range(self.d - 1)])

    def const(self, host_val, batch=()):
        """Broadcast a host element (nested tuple, or int meaning embed)."""
        if isinstance(host_val, int):
            host_val = self.host.embed(host_val)
        return self.join(
            self.base.const(c, batch) for c in host_val)

    # ---- Frobenius -------------------------------------------------------------

    def frobenius(self, a, i: int = 1):
        """x -> x^(p^i): base Frobenius per coefficient, then permute/scale by
        the host constants (j, gamma) with w^(k p^i) = gamma w^j (host.py)."""
        i %= self.host.degree_abs
        if i == 0:
            return a
        out = [None] * self.d
        bh = self.base.host
        for k, c in enumerate(self.split(a)):
            c = self.base.frobenius(c, i)
            j, g = self.host.frob_perm_gamma(k, i)
            if not bh.eq(g, bh.one()):
                c = self.base.mul(c, self.base.const(g, ()))
            out[j] = c
        return self.join(out)

    # ---- host conversion --------------------------------------------------------

    def from_ints(self, vals):
        """vals: sequence of host elements (nested tuples / ints)."""
        sp = self.spec
        flat = []
        for v in vals:
            if isinstance(v, int):
                v = self.host.embed(v)
            flat.append(self.host.coeffs(v))
        arr = np.asarray(flat, dtype=object)       # (N, d_abs)
        cols = [
            mont.from_ints(sp, [row[j] for row in flat])
            for j in range(self.host.degree_abs)
        ]
        del arr
        return jnp.concatenate(cols, axis=0)

    def to_ints(self, a):
        sp = self.spec
        d_abs = self.host.degree_abs
        comps = [
            mont.to_ints(sp, a[j * sp.n_limbs:(j + 1) * sp.n_limbs])
            for j in range(d_abs)
        ]
        shape = comps[0].shape
        out = np.empty(shape, dtype=object)
        it = np.nditer(comps[0], flags=["multi_index", "refs_ok"])
        for _ in it:
            idx = it.multi_index
            out[idx] = self.host.from_coeffs([int(c[idx]) for c in comps])
        return out

    def rand_host(self, rng):
        return self.host.rand(rng)


def batch_inverse(ops, a, axis: int = -1):
    """Montgomery batch inversion along a batch axis, generic over any Ops
    (same prefix/suffix associative-scan scheme as fields.mont.batch_inverse)."""
    if axis < 0:
        axis += a.ndim
    assert axis >= 1, "axis 0 is the limb axis"
    zmask = ops.is_zero(a)
    aa = ops.select(zmask, ops.one(a.shape[1:]), a)
    prefix = jax.lax.associative_scan(lambda x, y: ops.mul(x, y), aa, axis=axis)
    n_el = a.shape[axis]
    total = jax.lax.index_in_dim(prefix, n_el - 1, axis=axis, keepdims=True)
    inv_total = ops.inverse(total)
    suffix = jax.lax.associative_scan(
        lambda x, y: ops.mul(x, y), aa, axis=axis, reverse=True)
    shift_p = jnp.roll(prefix, 1, axis=axis)
    ones_ = ops.one(a.shape[1:])
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape[1:], axis - 1)
    shift_p = ops.select(idx == 0, ones_, shift_p)
    shift_s = jnp.roll(suffix, -1, axis=axis)
    shift_s = ops.select(idx == n_el - 1, ones_, shift_s)
    out = ops.mul(ops.mul(shift_p, shift_s), inv_total)
    return ops.select(zmask, ops.zeros(a.shape[1:]), out)


def pow_host(ops, a, e: int):
    """a^e for a host integer exponent, scanned square-and-multiply (the
    flat-Ops analogue of mont.pow_const)."""
    if e < 0:
        # only valid when a is invertible; callers on cyclotomic elements
        # should conj instead.
        return pow_host(ops, ops.inverse(a), -e)
    if e == 0:
        return ops.one(a.shape[1:])
    bits = bin(e)[2:]
    if len(bits) <= 4:
        r = a
        for bit in bits[1:]:
            r = ops.square(r)
            if bit == "1":
                r = ops.mul(r, a)
        return r
    bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

    def body(res, bit):
        res = ops.square(res)
        res = ops.select(
            jnp.broadcast_to(bit, res.shape[1:]), ops.mul(res, a), res)
        return res, None

    r, _ = jax.lax.scan(body, a, bit_arr)
    return r
