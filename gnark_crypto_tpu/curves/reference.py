"""Pure-Python affine short-Weierstrass oracle (a = 0 unless given).

Role: test oracle for the batched device kernels (the math/big analogue,
SURVEY.md §4.2) and host-side helper for tiny latency-bound finalization
(e.g. verifying GLV constant derivation).  Points are (x, y) int tuples;
None = point at infinity.
"""

from __future__ import annotations


class RefCurve:
    def __init__(self, p: int, a: int, b: int, order: int | None = None):
        self.p = p
        self.a = a % p
        self.b = b % p
        self.order = order

    def is_on_curve(self, P):
        if P is None:
            return True
        x, y = P
        return (y * y - x * x * x - self.a * x - self.b) % self.p == 0

    def neg(self, P):
        if P is None:
            return None
        return (P[0], (-P[1]) % self.p)

    def add(self, P, Q):
        p = self.p
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            # double
            lam = (3 * x1 * x1 + self.a) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def double(self, P):
        return self.add(P, P)

    def mul(self, k: int, P):
        if P is None:
            return None
        if k < 0:
            return self.mul(-k, self.neg(P))
        R = None
        A = P
        while k:
            if k & 1:
                R = self.add(R, A)
            A = self.add(A, A)
            k >>= 1
        return R

    def msm(self, scalars, points):
        R = None
        for s, P in zip(scalars, points):
            R = self.add(R, self.mul(s % (self.order or 1 << 512), P))
        return R


def derive_glv(p: int, r: int, curve: RefCurve, G) -> tuple[int, int]:
    """Derive matched (lambda mod r, beta mod p) for the cube-root endomorphism
    phi(x, y) = (beta*x, y) == lambda * (x, y), verified on the generator.

    Replaces trusting hardcoded constants (ecc/bn254/bn254.go lambdaGLV /
    thirdRootOneG1) with derivation + check.
    """

    def roots_of_unity(q):
        # solutions of z^2 + z + 1 = 0: z = (-1 ± sqrt(-3))/2
        from ..fields.reference import PF

        pf = PF(q)
        s = pf.sqrt(q - 3)
        assert s is not None, "sqrt(-3) must exist for GLV curves"
        inv2 = pow(2, -1, q)
        return ((-1 + s) * inv2 % q, (-1 - s) * inv2 % q)

    lams = roots_of_unity(r)
    betas = roots_of_unity(p)
    for lam in lams:
        lamG = curve.mul(lam, G)
        for beta in betas:
            if lamG == (G[0] * beta % p, G[1]):
                return lam, beta
    raise AssertionError("no matching (lambda, beta) pair found")


def find_point(curve: RefCurve, seed: int = 1):
    """Deterministic random point on E(Fp) via incremental x + Tonelli sqrt."""
    from ..fields.reference import PF

    pf = PF(curve.p)
    x = seed % curve.p
    while True:
        rhs = (x * x * x + curve.a * x + curve.b) % curve.p
        y = pf.sqrt(rhs)
        if y is not None:
            return (x, y)
        x = (x + 1) % curve.p


def derive_cofactor(p: int, r: int, curve: RefCurve) -> int:
    """Cofactor h = #E(Fp)/r by Hasse-window search: #E = p+1-t with
    |t| <= 2*sqrt(p), so h lies in a tiny integer window around p/r which we
    scan, checking [h*r]P == 0 on sample points.  Self-verifying alternative
    to transcribing the reference's per-curve cofactor constants
    (e.g. ecc/bw6-761/g1.go cofactor usage)."""
    import math

    sqrt_p = math.isqrt(p)
    lo = (p + 1 - 2 * sqrt_p - 2) // r
    hi = (p + 1 + 2 * sqrt_p + 2) // r + 1
    pts = [find_point(curve, s) for s in (2, 3)]
    for h in range(lo, hi + 1):
        n = h * r
        if all(curve.mul(n, P) is None for P in pts):
            # confirm n is in the Hasse interval
            if abs(p + 1 - n) <= 2 * sqrt_p + 1:
                return h
    raise AssertionError("no cofactor found in Hasse window (r does not divide #E?)")
