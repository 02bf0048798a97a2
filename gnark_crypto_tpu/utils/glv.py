"""GLV lattice machinery and NAF decomposition — host-side scalar math.

Python reimplementation of the reference's ecc/utils.go:
  NafDecomposition :12, Lattice :54, PrecomputeLattice :62, SplitScalar :142,
  rounding :160, getVector :172, NextPowerOfTwo :184.

Used by GLV scalar multiplication (split a 2t-bit scalar into two ~t-bit
halves against the eigenvalue lambda of the cube-root endomorphism) and by
the BW6 NAF Miller-loop counters.  All host ints: this is latency-bound
protocol glue, not device work (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import dataclasses
import math


def naf_decomposition(a: int) -> list[int]:
    """Non-adjacent form, least-significant digit first (NafDecomposition)."""
    assert a >= 0
    out = []
    while a != 0:
        if a & 1 == 0:
            out.append(0)
        elif a & 3 == 3:
            out.append(-1)
            a += 1
        else:
            out.append(1)
        a >>= 1
    return out


def naf_value(digits) -> int:
    return sum(d << i for i, d in enumerate(digits))


@dataclasses.dataclass
class Lattice:
    """Short basis of ker((u,v) -> u + v*lambda mod r) plus Barrett-style
    rounding constants (ecc/utils.go Lattice)."""

    v1: tuple[int, int]
    v2: tuple[int, int]
    det: int
    b1: int
    b2: int
    shift: int  # n with 2^n > det, as in the reference (bit twiddle kept)


def _rounding(n: int, d: int) -> int:
    """Closest integer to n/d (ties toward floor), matching utils.go:160."""
    r = n % d
    res = n // d
    if r > (d >> 1):
        res += 1
    return res


def precompute_lattice(r: int, lam: int) -> Lattice:
    """Half-GCD short vectors (v11 + v12*lambda = 0 mod r), utils.go:62."""
    rst0 = [r, 1, 0]
    rst1 = [lam % r, 0, 1]
    sq = math.isqrt(r)
    while rst1[0] > sq:
        q = rst0[0] // rst1[0]
        rem = rst0[0] % rst1[0]
        nxt = [rem, rst0[1] - q * rst1[1], rst0[2] - q * rst1[2]]
        rst0, rst1 = rst1, nxt
    q = rst0[0] // rst1[0]
    _r = rst0[0] % rst1[0]
    _t = rst0[2] - q * rst1[2]

    v1 = (rst1[0], -rst1[2])
    # shorter of (rst0[0], rst0[2]) and (_r, _t)
    if rst0[0] ** 2 + rst0[2] ** 2 > _r**2 + _t**2:
        v2 = (_r, -_t)
    else:
        v2 = (rst0[0], -rst0[2])

    det = v1[0] * v2[1] - v1[1] * v2[0]
    n = 2 * (((abs(det).bit_length() + 32) >> 6) << 6)
    b1 = _rounding(v2[1] << n, det)
    b2 = _rounding(v1[1] << n, det)
    return Lattice(v1=v1, v2=v2, det=det, b1=b1, b2=b2, shift=n)


def split_scalar(s: int, lat: Lattice) -> tuple[int, int]:
    """(u, v) with u + v*lambda = s mod r and |u|,|v| ~ sqrt(r)
    (SplitScalar, utils.go:142)."""
    k1 = (s * lat.b1) >> lat.shift
    k2 = (-(s * lat.b2)) >> lat.shift
    w0 = k1 * lat.v1[0] + k2 * lat.v2[0]
    w1 = k1 * lat.v1[1] + k2 * lat.v2[1]
    return (s - w0, -w1)


def next_power_of_two(n: int) -> int:
    assert n >= 0
    if n == 0:
        return 1
    return 1 << (n - 1).bit_length()
