"""Pure-Python tower-field and pairing oracle.

Plays the role of an independent reimplementation to test device kernels
against (SURVEY.md §4.2).  The pairing here is the *textbook* optimal-ate:
Miller loop with generic Fp12 line evaluations on the untwisted curve and a
final exponentiation by direct powering — slow but transparently correct.
The device implementation (pairing/) uses the optimized route (sparse line
muls, Karabina/GS cyclotomic squares) and must agree with this oracle.

Tower shapes follow the reference:
  Fp2  = Fp[u]/(u^2 - u2)                   (u2 = -1 or -5)
  Fp6  = Fp2[v]/(v^3 - xi)
  Fp12 = Fp6[w]/(w^2 - v)
cf. ecc/bn254/bn254.go:16-20, ecc/bls12-377/bls12-377.go doc header.
"""

from __future__ import annotations

import dataclasses
import functools


@dataclasses.dataclass(frozen=True)
class TowerSpec:
    name: str
    p: int                      # base field modulus
    r: int                      # subgroup order
    u2: int                     # u^2 = u2 in Fp
    xi: tuple[int, int]         # v^3 = xi = xi[0] + xi[1]*u
    twist: str                  # 'D' or 'M'
    b: int                      # E: y^2 = x^3 + b
    seed: int                   # curve family parameter t (x0)
    family: str                 # 'bn' or 'bls12'
    g2x: tuple[int, int]
    g2y: tuple[int, int]


class E2:
    """Host-side Fp2 arithmetic on int pairs."""

    def __init__(self, ts: TowerSpec):
        self.p = ts.p
        self.u2 = ts.u2 % ts.p

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def neg(self, a):
        return ((-a[0]) % self.p, (-a[1]) % self.p)

    def mul(self, a, b):
        p = self.p
        t0 = a[0] * b[0] % p
        t1 = a[1] * b[1] % p
        t2 = (a[0] + a[1]) * (b[0] + b[1]) % p
        return ((t0 + self.u2 * t1) % p, (t2 - t0 - t1) % p)

    def square(self, a):
        return self.mul(a, a)

    def mul_scalar(self, a, k):
        return (a[0] * k % self.p, a[1] * k % self.p)

    def conj(self, a):
        return (a[0], (-a[1]) % self.p)

    def inv(self, a):
        # (a0 - a1 u)(a0 + a1 u) = a0^2 - u2 a1^2
        p = self.p
        d = (a[0] * a[0] - self.u2 * a[1] * a[1]) % p
        dinv = pow(d, -1, p)
        return (a[0] * dinv % p, (-a[1]) * dinv % p)

    def zero(self):
        return (0, 0)

    def one(self):
        return (1, 0)

    def is_zero(self, a):
        return a[0] % self.p == 0 and a[1] % self.p == 0

    def pow(self, a, e):
        r = self.one()
        b = a
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.square(b)
            e >>= 1
        return r


class E6:
    """Fp6 = Fp2[v]/(v^3 - xi) on triples of E2 elements."""

    def __init__(self, ts: TowerSpec):
        self.e2 = E2(ts)
        self.xi = (ts.xi[0] % ts.p, ts.xi[1] % ts.p)

    def mul_by_xi(self, a):  # a in E2
        return self.e2.mul(a, self.xi)

    def add(self, a, b):
        return tuple(self.e2.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.e2.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.e2.neg(x) for x in a)

    def mul(self, a, b):
        e2 = self.e2
        t0 = e2.mul(a[0], b[0])
        t1 = e2.mul(a[1], b[1])
        t2 = e2.mul(a[2], b[2])
        c0 = e2.add(t0, self.mul_by_xi(
            e2.sub(e2.mul(e2.add(a[1], a[2]), e2.add(b[1], b[2])), e2.add(t1, t2))))
        c1 = e2.add(
            e2.sub(e2.mul(e2.add(a[0], a[1]), e2.add(b[0], b[1])), e2.add(t0, t1)),
            self.mul_by_xi(t2))
        c2 = e2.add(
            e2.sub(e2.mul(e2.add(a[0], a[2]), e2.add(b[0], b[2])), e2.add(t0, t2)), t1)
        return (c0, c1, c2)

    def square(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a):
        """a * v = (xi*a2, a0, a1)."""
        return (self.mul_by_xi(a[2]), a[0], a[1])

    def inv(self, a):
        e2 = self.e2
        a0, a1, a2 = a
        t0 = e2.square(a0)
        t1 = e2.square(a1)
        t2 = e2.square(a2)
        t3 = e2.mul(a0, a1)
        t4 = e2.mul(a0, a2)
        t5 = e2.mul(a1, a2)
        c0 = e2.sub(t0, self.mul_by_xi(t5))
        c1 = e2.sub(self.mul_by_xi(t2), t3)
        c2 = e2.sub(t1, t4)
        t6 = e2.add(e2.mul(a0, c0),
                    self.mul_by_xi(e2.add(e2.mul(a2, c1), e2.mul(a1, c2))))
        t6i = e2.inv(t6)
        return (e2.mul(c0, t6i), e2.mul(c1, t6i), e2.mul(c2, t6i))

    def zero(self):
        z = self.e2.zero()
        return (z, z, z)

    def one(self):
        return (self.e2.one(), self.e2.zero(), self.e2.zero())

    def is_zero(self, a):
        return all(self.e2.is_zero(x) for x in a)


class E12:
    """Fp12 = Fp6[w]/(w^2 - v) on pairs of E6 elements."""

    def __init__(self, ts: TowerSpec):
        self.ts = ts
        self.e6 = E6(ts)
        self.e2 = self.e6.e2

    def add(self, a, b):
        return (self.e6.add(a[0], b[0]), self.e6.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.e6.sub(a[0], b[0]), self.e6.sub(a[1], b[1]))

    def neg(self, a):
        return (self.e6.neg(a[0]), self.e6.neg(a[1]))

    def mul(self, a, b):
        e6 = self.e6
        t0 = e6.mul(a[0], b[0])
        t1 = e6.mul(a[1], b[1])
        c0 = e6.add(t0, e6.mul_by_v(t1))
        c1 = e6.sub(e6.sub(e6.mul(e6.add(a[0], a[1]), e6.add(b[0], b[1])), t0), t1)
        return (c0, c1)

    def square(self, a):
        return self.mul(a, a)

    def conj(self, a):
        return (a[0], self.e6.neg(a[1]))

    def inv(self, a):
        e6 = self.e6
        d = e6.sub(e6.square(a[0]), e6.mul_by_v(e6.square(a[1])))
        di = e6.inv(d)
        return (e6.mul(a[0], di), e6.neg(e6.mul(a[1], di)))

    def zero(self):
        return (self.e6.zero(), self.e6.zero())

    def one(self):
        return (self.e6.one(), self.e6.zero())

    def is_zero(self, a):
        return self.e6.is_zero(a[0]) and self.e6.is_zero(a[1])

    def is_one(self, a):
        return a == self.one()

    def pow(self, a, e):
        if e < 0:
            return self.pow(self.inv(a), -e)
        r = self.one()
        b = a
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.square(b)
            e >>= 1
        return r

    # embedding helpers -----------------------------------------------------
    def from_fp(self, x: int):
        z2 = (x % self.ts.p, 0)
        return ((z2, self.e2.zero(), self.e2.zero()), self.e6.zero())

    def from_e2(self, x):
        return ((x, self.e2.zero(), self.e2.zero()), self.e6.zero())

    def w(self):
        """The generator w (coefficient 1 of the degree-1 E6 part)."""
        return (self.e6.zero(), self.e6.one())


class PairingOracle:
    """Textbook optimal-ate pairing on the untwisted curve over Fp12."""

    def __init__(self, ts: TowerSpec):
        self.ts = ts
        self.fp12 = E12(ts)
        self.e2 = self.fp12.e2

    # ---- E(Fp12) affine ops (field-generic) ----
    def _add(self, A, B):
        f = self.fp12
        if A is None:
            return B
        if B is None:
            return A
        x1, y1 = A
        x2, y2 = B
        if x1 == x2:
            if f.is_zero(f.add(y1, y2)):
                return None
            num = f.mul(f.from_fp(3), f.square(x1))
            den = f.add(y1, y1)
        else:
            num = f.sub(y2, y1)
            den = f.sub(x2, x1)
        lam = f.mul(num, f.inv(den))
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def _line(self, A, B, P12):
        """Evaluate the line through A,B (or tangent at A if A==B) at P."""
        f = self.fp12
        xp, yp = P12
        x1, y1 = A
        if B is None or A is None:
            return f.one()
        x2, y2 = B
        if x1 == x2 and f.is_zero(f.add(y1, y2)):
            # vertical line
            return f.sub(xp, x1)
        if A == B:
            num = f.mul(f.from_fp(3), f.square(x1))
            den = f.add(y1, y1)
        else:
            num = f.sub(y2, y1)
            den = f.sub(x2, x1)
        lam = f.mul(num, f.inv(den))
        # l = (yp - y1) - lam*(xp - x1)
        return f.sub(f.sub(yp, y1), f.mul(lam, f.sub(xp, x1)))

    def untwist(self, Q):
        """E'(Fp2) -> E(Fp12).  D-twist: (x w^2, y w^3); M-twist: (x/w^2, y/w^3)."""
        f = self.fp12
        x12 = f.from_e2(Q[0])
        y12 = f.from_e2(Q[1])
        w = f.w()
        w2 = f.square(w)
        w3 = f.mul(w2, w)
        if self.ts.twist == "D":
            return (f.mul(x12, w2), f.mul(y12, w3))
        return (f.mul(x12, f.inv(w2)), f.mul(y12, f.inv(w3)))

    def frobenius_e2_point(self, Q):
        """pi(x, y) = (x^p, y^p) on the untwisted curve, computed in Fp12."""
        f = self.fp12
        p = self.ts.p
        # brute force: coefficient-wise Frobenius via powering in Fp12
        return (f.pow(Q[0], p), f.pow(Q[1], p))

    def miller_loop(self, P, Q):
        """P in E(Fp) affine int pair; Q in E'(Fp2) affine E2 pair."""
        f = self.fp12
        ts = self.ts
        P12 = (f.from_fp(P[0]), f.from_fp(P[1]))
        T = self.untwist(Q)
        Qu = T
        if ts.family == "bn":
            m = 6 * ts.seed + 2
        else:
            m = abs(ts.seed)
        acc = f.one()
        for bit in bin(m)[3:]:
            acc = f.square(acc)
            acc = f.mul(acc, self._line(T, T, P12))
            T = self._add(T, T)
            if bit == "1":
                acc = f.mul(acc, self._line(T, Qu, P12))
                T = self._add(T, Qu)
        if ts.family == "bn":
            # two frobenius addition steps (optimal ate for BN)
            Q1 = self.frobenius_e2_point(Qu)
            Q2 = self.frobenius_e2_point(Q1)
            Q2 = (Q2[0], f.neg(Q2[1]))
            acc = f.mul(acc, self._line(T, Q1, P12))
            T = self._add(T, Q1)
            acc = f.mul(acc, self._line(T, Q2, P12))
            T = self._add(T, Q2)
        elif ts.seed < 0:
            acc = f.conj(acc)  # f_{-m} = conj(f_m) after final exp trick
        return acc

    @functools.cached_property
    def final_exp_exponent(self) -> int:
        p, r = self.ts.p, self.ts.r
        return (p**12 - 1) // r

    def final_exp(self, x):
        return self.fp12.pow(x, self.final_exp_exponent)

    def pair(self, P, Q):
        return self.final_exp(self.miller_loop(P, Q))


class RefCurveGeneric:
    """Affine short-Weierstrass oracle over any field object exposing
    add/sub/mul/neg/inv/square/is_zero/zero/one (e.g. E2) — used for the twist
    curve E'(Fp2) test points."""

    def __init__(self, field, b):
        self.f = field
        self.b = b

    def is_on_curve(self, P):
        if P is None:
            return True
        f = self.f
        x, y = P
        lhs = f.square(y)
        rhs = f.add(f.mul(f.square(x), x), self.b)
        return lhs == rhs

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
        if x1 == x2:
            if f.is_zero(f.add(y1, y2)):
                return None
            num = f.mul_scalar(f.square(x1), 3)
            den = f.add(y1, y1)
        else:
            num = f.sub(y2, y1)
            den = f.sub(x2, x1)
        lam = f.mul(num, f.inv(den))
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, k, P):
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


def twist_b(ts: TowerSpec):
    """b coefficient of the twist curve E' over Fp2: b/xi (D) or b*xi (M)."""
    e2 = E2(ts)
    xi = (ts.xi[0] % ts.p, ts.xi[1] % ts.p)
    b2 = (ts.b % ts.p, 0)
    if ts.twist == "D":
        return e2.mul(b2, e2.inv(xi))
    return e2.mul(b2, xi)


def twist_curve(ts: TowerSpec) -> RefCurveGeneric:
    return RefCurveGeneric(E2(ts), twist_b(ts))


# ---------------------------------------------------------------------------
# tower specs per curve
# ---------------------------------------------------------------------------


@functools.cache
def bn254_tower() -> TowerSpec:
    from ..curves.spec import bn254

    cs = bn254()
    return TowerSpec(
        name="bn254",
        p=cs.fp.modulus,
        r=cs.fr.modulus,
        u2=-1,
        xi=(9, 1),
        twist="D",
        b=3,
        seed=cs.seed,
        family="bn",
        # ecc/bn254/bn254.go:116-119
        g2x=(
            10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634,
        ),
        g2y=(
            8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531,
        ),
    )


@functools.cache
def bls12_381_tower() -> TowerSpec:
    from ..curves.spec import bls12_381

    cs = bls12_381()
    return TowerSpec(
        name="bls12_381",
        p=cs.fp.modulus,
        r=cs.fr.modulus,
        u2=-1,
        xi=(1, 1),
        twist="M",
        b=4,
        seed=cs.seed,
        family="bls12",
        # ecc/bls12-381/bls12-381.go:110-113
        g2x=(
            352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
            3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758,
        ),
        g2y=(
            1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
            927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582,
        ),
    )


@functools.cache
def bls12_377_tower() -> TowerSpec:
    from ..curves.spec import bls12_377

    cs = bls12_377()
    return TowerSpec(
        name="bls12_377",
        p=cs.fp.modulus,
        r=cs.fr.modulus,
        u2=-5,
        xi=(0, 1),
        twist="D",
        b=1,
        seed=cs.seed,
        family="bls12",
        # ecc/bls12-377/bls12-377.go:111-114
        g2x=(
            233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
            140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118,
        ),
        g2y=(
            63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
            149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491,
        ),
    )
