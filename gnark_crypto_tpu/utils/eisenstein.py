"""Arbitrary-precision Eisenstein integers Z[omega], omega^2 + omega + 1 = 0.

Host-side reimplementation of field/eisenstein/eisenstein.go (ComplexNumber:
Mul :92, Norm :113, QuoRem :128, HalfGCD :145) — used for GLS/GLV lattice
reduction on curves with cube-root endomorphisms.  Elements are (a0, a1)
int tuples representing a0 + a1*omega.
"""

from __future__ import annotations

import math

Eis = tuple  # (a0, a1)

ZERO = (0, 0)
ONE = (1, 0)


def add(x: Eis, y: Eis) -> Eis:
    return (x[0] + y[0], x[1] + y[1])


def sub(x: Eis, y: Eis) -> Eis:
    return (x[0] - y[0], x[1] - y[1])


def neg(x: Eis) -> Eis:
    return (-x[0], -x[1])


def conjugate(x: Eis) -> Eis:
    """conj(a0 + a1 w) = (a0 - a1) - a1 w  (since conj(w) = w^2 = -1-w)."""
    return (x[0] - x[1], -x[1])


def mul(x: Eis, y: Eis) -> Eis:
    """(x0 + x1 w)(y0 + y1 w) = x0y0 - x1y1 + (x0y1 + x1y0 - x1y1) w
    (using w^2 = -w - 1; eisenstein.go:89-92)."""
    a = x[0] * y[0] - x[1] * y[1]
    b = x[0] * y[1] + x[1] * y[0] - x[1] * y[1]
    return (a, b)


def norm(x: Eis) -> int:
    """N(x0 + x1 w) = x0^2 + x1^2 - x0 x1 (eisenstein.go:113)."""
    return x[0] * x[0] + x[1] * x[1] - x[0] * x[1]


def quo_rem(x: Eis, y: Eis) -> tuple[Eis, Eis]:
    """Euclidean division: q = round-ish(x * conj(y) / N(y)) with Go-style
    truncated division (matching eisenstein.go:128), r = x - y*q."""
    n = norm(y)
    if n == 0:
        raise ZeroDivisionError("division by zero")
    t = mul(x, conjugate(y))

    def _godiv(a: int, b: int) -> int:
        # Go big.Int.Div is Euclidean (result s.t. remainder >= 0)? No:
        # big.Int.Div implements Euclidean division (sign of divisor).
        # For b > 0 it floors.  Here n = Norm > 0 always.
        return a // b

    q = (_godiv(t[0], n), _godiv(t[1], n))
    r = sub(x, mul(y, q))
    return q, r


def half_gcd(a: Eis, b: Eis):
    """Rational reconstruction: returns (w, v, u) with w = a*u + b*v and
    N(w) < sqrt(N(a)) (eisenstein.go:145)."""
    a_run, b_run = a, b
    u, v = ONE, ZERO
    u_, v_ = ZERO, ONE
    sqrt_na = math.isqrt(norm(a))
    while norm(b_run) >= sqrt_na:
        q, r = quo_rem(a_run, b_run)
        t1 = sub(u, mul(u_, q))
        t2 = sub(v, mul(v_, q))
        a_run, b_run = b_run, r
        u, v = u_, v_
        u_, v_ = t1, t2
    return b_run, v_, u_
