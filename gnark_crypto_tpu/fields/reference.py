"""Pure-Python big-int oracle for prime-field arithmetic.

Role mirrors the reference's practice of testing generated field code against
math/big models (SURVEY.md §4.2; field/generator/config/field_config.go:366-443
ToMont/Mul/Add/Exp).  Used by the test-suite as the source of truth and by
host-side protocol glue (transcripts, GLV precompute) where scalar big-int math
is cheaper than a device round-trip.
"""

from __future__ import annotations


class PF:
    """Prime field F_q on Python ints. Values are canonical ints in [0, q)."""

    def __init__(self, q: int):
        self.q = q

    def add(self, a, b):
        return (a + b) % self.q

    def sub(self, a, b):
        return (a - b) % self.q

    def neg(self, a):
        return (-a) % self.q

    def mul(self, a, b):
        return (a * b) % self.q

    def square(self, a):
        return (a * a) % self.q

    def inv(self, a):
        if a % self.q == 0:
            return 0  # convention: Inverse(0) = 0, like the reference
        return pow(a, -1, self.q)

    def div(self, a, b):
        return (a * self.inv(b)) % self.q

    def exp(self, a, e):
        return pow(a, e, self.q)

    def legendre(self, a):
        if a % self.q == 0:
            return 0
        r = pow(a, (self.q - 1) // 2, self.q)
        return 1 if r == 1 else -1

    def sqrt(self, a):
        """Tonelli-Shanks; returns None if a is not a QR."""
        a %= self.q
        if a == 0:
            return 0
        if self.legendre(a) != 1:
            return None
        q = self.q
        s, odd = 0, q - 1
        while odd % 2 == 0:
            s += 1
            odd //= 2
        if s == 1:
            return pow(a, (q + 1) // 4, q)
        nr = 2
        while self.legendre(nr) != -1:
            nr += 1
        z = pow(nr, odd, q)
        m, c, t, r = s, z, pow(a, odd, q), pow(a, (odd + 1) // 2, q)
        while t != 1:
            i, t2 = 0, t
            while t2 != 1:
                t2 = (t2 * t2) % q
                i += 1
            b = pow(c, 1 << (m - i - 1), q)
            m, c = i, (b * b) % q
            t = (t * c) % q
            r = (r * b) % q
        return r
