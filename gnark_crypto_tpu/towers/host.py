"""Generic host-side (big-int) tower field arithmetic.

Independent oracle + constant factory for arbitrary extension towers
(quadratic / cubic steps), covering every tower shape in the reference:
  BN/BLS12 : Fp2 -> Fp6 -> Fp12   (fptower e2/e6/e12)
  BLS24    : Fp2 -> Fp4 -> Fp12 -> Fp24  (ecc/bls24-315/internal/fptower)
  BW6      : Fp3 -> Fp6            (ecc/bw6-761/internal/fptower e3/e6)

Elements are plain ints (prime field) or tuples of base elements (extensions),
so the same code is the test oracle AND the host constant generator (Frobenius
gammas, twist constants) for the device kernels in towers/ext.py.
"""

from __future__ import annotations

import functools


class HostPrime:
    """F_p on Python ints."""

    degree_abs = 1  # absolute extension degree over Fp

    def __init__(self, p: int):
        self.p = p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def neg(self, a):
        return (-a) % self.p

    def mul(self, a, b):
        return a * b % self.p

    def square(self, a):
        return a * a % self.p

    def inv(self, a):
        return pow(a, -1, self.p)

    def zero(self):
        return 0

    def one(self):
        return 1

    def is_zero(self, a):
        return a % self.p == 0

    def eq(self, a, b):
        return (a - b) % self.p == 0

    def embed(self, x: int):
        return x % self.p

    def mul_small(self, a, k: int):
        return a * k % self.p

    def pow(self, a, e: int):
        if e < 0:
            return pow(self.inv(a), -e, self.p)
        return pow(a, e, self.p)

    def frobenius(self, a, i: int = 1):
        return a

    def coeffs(self, a) -> list[int]:
        """Flatten to Fp coefficient list (length = degree_abs)."""
        return [a % self.p]

    def from_coeffs(self, c: list[int]):
        assert len(c) == 1
        return c[0] % self.p

    def rand(self, rng):
        return int(rng.integers(0, 2**62)) % self.p


class HostExt:
    """K = B[w]/(w^d - nr) on d-tuples of base elements, d in {2, 3}."""

    def __init__(self, base, d: int, nr, name: str = ""):
        assert d in (2, 3)
        self.base = base
        self.d = d
        self.nr = nr
        self.p = base.p
        self.name = name
        self.degree_abs = d * base.degree_abs

    # ---- ring ops ----------------------------------------------------------

    def add(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.base.neg(x) for x in a)

    def mul_nr(self, x):
        """x * nr in the base field."""
        return self.base.mul(x, self.nr)

    def mul(self, a, b):
        B = self.base
        if self.d == 2:
            t0 = B.mul(a[0], b[0])
            t1 = B.mul(a[1], b[1])
            t2 = B.mul(B.add(a[0], a[1]), B.add(b[0], b[1]))
            return (B.add(t0, self.mul_nr(t1)), B.sub(B.sub(t2, t0), t1))
        t0 = B.mul(a[0], b[0])
        t1 = B.mul(a[1], b[1])
        t2 = B.mul(a[2], b[2])
        c0 = B.add(t0, self.mul_nr(B.sub(
            B.mul(B.add(a[1], a[2]), B.add(b[1], b[2])), B.add(t1, t2))))
        c1 = B.add(B.sub(
            B.mul(B.add(a[0], a[1]), B.add(b[0], b[1])), B.add(t0, t1)),
            self.mul_nr(t2))
        c2 = B.add(B.sub(
            B.mul(B.add(a[0], a[2]), B.add(b[0], b[2])), B.add(t0, t2)), t1)
        return (c0, c1, c2)

    def square(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        return tuple(self.base.mul_small(x, k) for x in a)

    def mul_base(self, a, s):
        """Multiply by an element s of the base field."""
        return tuple(self.base.mul(x, s) for x in a)

    def mul_gen(self, a):
        """a * w (the generator of this extension)."""
        if self.d == 2:
            return (self.mul_nr(a[1]), a[0])
        return (self.mul_nr(a[2]), a[0], a[1])

    def conj(self, a):
        """Quadratic conjugation a0 - a1 w (d == 2 only)."""
        assert self.d == 2
        return (a[0], self.base.neg(a[1]))

    def inv(self, a):
        B = self.base
        if self.d == 2:
            d = B.sub(B.square(a[0]), self.mul_nr(B.square(a[1])))
            di = B.inv(d)
            return (B.mul(a[0], di), B.neg(B.mul(a[1], di)))
        a0, a1, a2 = a
        t0, t1, t2 = B.square(a0), B.square(a1), B.square(a2)
        t3, t4, t5 = B.mul(a0, a1), B.mul(a0, a2), B.mul(a1, a2)
        c0 = B.sub(t0, self.mul_nr(t5))
        c1 = B.sub(self.mul_nr(t2), t3)
        c2 = B.sub(t1, t4)
        t6 = B.add(B.mul(a0, c0),
                   self.mul_nr(B.add(B.mul(a2, c1), B.mul(a1, c2))))
        t6i = B.inv(t6)
        return (B.mul(c0, t6i), B.mul(c1, t6i), B.mul(c2, t6i))

    # ---- structure ---------------------------------------------------------

    def zero(self):
        return tuple(self.base.zero() for _ in range(self.d))

    def one(self):
        return (self.base.one(),) + tuple(
            self.base.zero() for _ in range(self.d - 1))

    def gen(self):
        """The extension generator w."""
        return (self.base.zero(), self.base.one()) + tuple(
            self.base.zero() for _ in range(self.d - 2))

    def is_zero(self, a):
        return all(self.base.is_zero(x) for x in a)

    def eq(self, a, b):
        return all(self.base.eq(x, y) for x, y in zip(a, b))

    def embed(self, x: int):
        """Embed an Fp int."""
        return (self.base.embed(x),) + tuple(
            self.base.zero() for _ in range(self.d - 1))

    def embed_base(self, x):
        """Embed a base-field element."""
        return (x,) + tuple(self.base.zero() for _ in range(self.d - 1))

    def pow(self, a, e: int):
        if e < 0:
            return self.pow(self.inv(a), -e)
        r, b = self.one(), a
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.square(b)
            e >>= 1
        return r

    # ---- Frobenius ----------------------------------------------------------

    @functools.lru_cache(maxsize=None)
    def frob_perm_gamma(self, k: int, i: int):
        """(j, gamma): w^(k p^i) = gamma * w^j with j = k p^i mod d and
        gamma = nr^((k p^i - j)/d) in the base field.  Handles p != 1 mod d
        (e.g. bls24-317 where p = 2 mod 3): Frobenius then PERMUTES the
        cubic coefficients, it does not just scale them."""
        kp = k * self.p**i
        j = kp % self.d
        return j, self.base.pow(self.nr, (kp - j) // self.d)

    def frobenius(self, a, i: int = 1):
        """x -> x^(p^i) coefficient-wise: frob(a_k) * w^(k p^i)."""
        i %= self.degree_abs
        if i == 0:
            return a
        out = [None] * self.d
        for k, c in enumerate(a):
            c = self.base.frobenius(c, i)
            j, gamma = self.frob_perm_gamma(k, i)
            if not self.base.eq(gamma, self.base.one()):
                c = self.base.mul(c, gamma)
            out[j] = c
        return tuple(out)

    # ---- flattening (for device conversion) ---------------------------------

    def coeffs(self, a) -> list[int]:
        out = []
        for c in a:
            out.extend(self.base.coeffs(c))
        return out

    def from_coeffs(self, c: list[int]):
        assert len(c) == self.degree_abs
        step = self.base.degree_abs
        return tuple(
            self.base.from_coeffs(c[k * step:(k + 1) * step])
            for k in range(self.d)
        )

    def rand(self, rng):
        return tuple(self.base.rand(rng) for _ in range(self.d))


class HostCurve:
    """Affine short-Weierstrass y^2 = x^3 + a x + b over any host field.

    Generic replacement for RefCurveGeneric (towers/reference.py) that also
    handles a != 0; points are (x, y) tuples or None for infinity.
    """

    def __init__(self, field, b, a=None):
        self.f = field
        self.b = b
        self.a = a if a is not None else field.zero()

    def is_on_curve(self, P) -> bool:
        if P is None:
            return True
        f = self.f
        x, y = P
        rhs = f.add(f.add(f.mul(f.square(x), x), f.mul(self.a, x)), self.b)
        return f.eq(f.square(y), rhs)

    def neg(self, P):
        return None if P is None else (P[0], self.f.neg(P[1]))

    def add(self, P, Q):
        f = self.f
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if f.eq(x1, x2):
            if f.is_zero(f.add(y1, y2)):
                return None
            num = f.add(f.mul_small(f.square(x1), 3), self.a)
            den = f.add(y1, y1)
        else:
            num = f.sub(y2, y1)
            den = f.sub(x2, x1)
        lam = f.mul(num, f.inv(den))
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, k: int, P):
        if P is None:
            return None
        if k < 0:
            return self.mul(-k, self.neg(P))
        R, A = None, P
        while k:
            if k & 1:
                R = self.add(R, A)
            A = self.add(A, A)
            k >>= 1
        return R
