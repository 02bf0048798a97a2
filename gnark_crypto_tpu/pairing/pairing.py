"""Batched optimal-ate pairing on BN / BLS12 curves.

Device counterpart of ecc/bn254/pairing.go (MillerLoop :111,
FinalExponentiation :52) and ecc/bls12-381/pairing.go.  Differences:

- the Miller loop runs under lax.scan over the (static) loop-counter bits,
  with the addition step applied by select — one compiled body instead of an
  unrolled 66-iteration chain;
- line evaluations are built as sparse E12 elements ({w^k: E2} dict) and
  multiplied with the generic E12 mul for now (sparse MulBy034/014 fusion is a
  later optimization, e12_pairing.go:136);
- the final-exponentiation hard part is a generic scanned exponentiation by
  (p^4 - p^2 + 1)/r (family-specific addition chains like Fuentes/Karabina,
  pairing.go:52-106, are a later optimization);
- everything is batched over pairs; infinity inputs contribute the neutral
  line (selected at the end), matching Pair's skip semantics.

Line-function math (derived from the untwist maps, see docstrings below):
  D-twist (untwist (x,y) -> (x w^2, y w^3)): l = A0*yP + A1*xP w + A3 w^3
  M-twist (untwist (x,y) -> (x/w^2, y/w^3)): l = xi*A0*yP + A3 w^3 + A1*xP w^5
with, for the tangent at projective twist point (X, Y, Z):
  A0 = 2YZ^2,  A1 = -3X^2 Z,  A3 = 3X^3 - 2Y^2 Z
and for the chord through T=(X,Y,Z) and affine Q=(xq, yq):
  theta = Y - yq Z, lam = X - xq Z
  A0 = lam,  A1 = -theta,  A3 = theta*xq - lam*yq
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import Affine
from ..fields import mont
from ..towers.reference import E2 as RefE2
from ..towers.tower import E2, E12, Tower, tower


class G2Affine(NamedTuple):
    x: E2
    y: E2


class G2Proj(NamedTuple):
    x: E2
    y: E2
    z: E2


def g2_from_ints(tw: Tower, pts) -> G2Affine:
    """pts: list of ((x0,x1),(y0,y1)) or None (-> (0,0) infinity)."""
    zero = (0, 0)
    xs = [zero if P is None else P[0] for P in pts]
    ys = [zero if P is None else P[1] for P in pts]
    return G2Affine(tw.e2_from_ints(xs), tw.e2_from_ints(ys))


def g2_neg(tw: Tower, q: G2Affine) -> G2Affine:
    return G2Affine(q.x, tw.e2_neg(q.y))


def g2_is_inf(tw: Tower, q: G2Affine):
    return jnp.logical_and(tw.e2_is_zero(q.x), tw.e2_is_zero(q.y))


def _line_sparse(tw: Tower, a0: E2, a1: E2, a3: E2, xp, yp) -> E12:
    """Place line coefficients into the sparse E12 slots per twist type."""
    c_y = tw.e2_mul_by_fp(a0, yp)
    c_x = tw.e2_mul_by_fp(a1, xp)
    if tw.ts.twist == "D":
        return tw.e12_sparse({0: c_y, 1: c_x, 3: a3})
    return tw.e12_sparse({0: tw.e2_mul_xi(c_y), 3: a3, 5: c_x})


def _double_step(tw: Tower, t: G2Proj, xp, yp):
    """Projective doubling + tangent line (pairing.go doubleStep analogue)."""
    X, Y, Z = t
    X2 = tw.e2_square(X)
    Y2 = tw.e2_square(Y)
    Z2 = tw.e2_square(Z)
    W = tw.e2_mul_small(X2, 3)              # 3X^2
    S = tw.e2_mul(Y, Z)
    B = tw.e2_mul(tw.e2_mul(X, Y), S)
    H = tw.e2_sub(tw.e2_square(W), tw.e2_mul_small(B, 8))
    S2 = tw.e2_square(S)
    x3 = tw.e2_mul_small(tw.e2_mul(H, S), 2)
    y3 = tw.e2_sub(
        tw.e2_mul(W, tw.e2_sub(tw.e2_mul_small(B, 4), H)),
        tw.e2_mul_small(tw.e2_mul(Y2, S2), 8),
    )
    z3 = tw.e2_mul_small(tw.e2_mul(S, S2), 8)
    # line at P: A0 = 2YZ^2, A1 = -3X^2 Z, A3 = 3X^3 - 2Y^2 Z
    a0 = tw.e2_mul_small(tw.e2_mul(Y, Z2), 2)
    a1 = tw.e2_neg(tw.e2_mul(W, Z))
    a3 = tw.e2_sub(tw.e2_mul(W, X), tw.e2_mul_small(tw.e2_mul(Y2, Z), 2))
    line = _line_sparse(tw, a0, a1, a3, xp, yp)
    return G2Proj(x3, y3, z3), line


def _add_step(tw: Tower, t: G2Proj, q: G2Affine, xp, yp):
    """Projective mixed addition + chord line (pairing.go addMixedStep)."""
    X, Y, Z = t
    theta = tw.e2_sub(Y, tw.e2_mul(q.y, Z))
    lam = tw.e2_sub(X, tw.e2_mul(q.x, Z))
    lam2 = tw.e2_square(lam)
    lam3 = tw.e2_mul(lam2, lam)
    Wq = tw.e2_sub(
        tw.e2_mul(tw.e2_square(theta), Z),
        tw.e2_mul(lam2, tw.e2_add(X, tw.e2_mul(q.x, Z))),
    )
    x3 = tw.e2_mul(lam, Wq)
    y3 = tw.e2_sub(
        tw.e2_mul(theta, tw.e2_sub(tw.e2_mul(X, lam2), Wq)),
        tw.e2_mul(Y, lam3),
    )
    z3 = tw.e2_mul(lam3, Z)
    a0 = lam
    a1 = tw.e2_neg(theta)
    a3 = tw.e2_sub(tw.e2_mul(theta, q.x), tw.e2_mul(lam, q.y))
    line = _line_sparse(tw, a0, a1, a3, xp, yp)
    return G2Proj(x3, y3, z3), line


def _g2_frobenius(tw: Tower, q: G2Affine, power: int) -> G2Affine:
    """psi-Frobenius on twist coordinates: for the D-twist,
    pi(x, y) = (conj(x) gamma^2, conj(y) gamma^3), gamma = xi^((p-1)/6)."""
    e2 = RefE2(tw.ts)
    p = tw.ts.p
    xi = (tw.ts.xi[0] % p, tw.ts.xi[1] % p)
    g = e2.pow(xi, (p**power - 1) // 6)
    if tw.ts.twist == "M":
        g = e2.inv(g)
    g2c = e2.mul(g, g)
    g3c = e2.mul(g2c, g)
    x, y = q.x, q.y
    if power % 2 == 1:
        x, y = tw.e2_conj(x), tw.e2_conj(y)
    x = tw.e2_mul(x, tw.e2_const(g2c, ()))
    y = tw.e2_mul(y, tw.e2_const(g3c, ()))
    return G2Affine(x, y)


def miller_loop(tw: Tower, p: Affine, q: G2Affine) -> E12:
    """Batched Miller loop f_{m,Q}(P); m = 6t+2 (BN) or |t| (BLS12)."""
    ts = tw.ts
    xp, yp = p.x, p.y
    batch = xp.shape[1:]
    if ts.family == "bn":
        m = 6 * ts.seed + 2
    else:
        m = abs(ts.seed)
    bits = np.array([c == "1" for c in bin(m)[3:]], dtype=np.bool_)

    f0 = tw.e12_one(batch)
    t0 = G2Proj(q.x, q.y, tw.e2_one(batch))

    def body(carry, bit):
        f, t = carry
        f = tw.e12_square(f)
        t, line = _double_step(tw, t, xp, yp)
        f = tw.e12_mul_line(f, line)
        t_add, line_add = _add_step(tw, t, q, xp, yp)
        f_add = tw.e12_mul_line(f, line_add)
        mask = jnp.broadcast_to(bit, batch)
        f = tw.e12_select(mask, f_add, f)
        t = G2Proj(
            tw.e2_select(mask, t_add.x, t.x),
            tw.e2_select(mask, t_add.y, t.y),
            tw.e2_select(mask, t_add.z, t.z),
        )
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f0, t0), jnp.asarray(bits))

    if ts.family == "bn":
        q1 = _g2_frobenius(tw, q, 1)
        q2 = _g2_frobenius(tw, q, 2)
        q2 = G2Affine(q2.x, tw.e2_neg(q2.y))
        t, l1 = _add_step(tw, t, q1, xp, yp)
        f = tw.e12_mul_line(f, l1)
        t, l2 = _add_step(tw, t, q2, xp, yp)
        f = tw.e12_mul_line(f, l2)
    elif ts.seed < 0:
        f = tw.e12_conj(f)

    # infinity inputs contribute the neutral element (Pair's skip semantics)
    from ..curves.point import Affine as _Aff

    p_inf = jnp.logical_and(
        mont.is_zero(tw.fp, xp), mont.is_zero(tw.fp, yp)
    )
    inf = jnp.logical_or(p_inf, g2_is_inf(tw, q))
    return tw.e12_select(inf, tw.e12_one(batch), f)


def final_exponentiation(tw: Tower, f: E12) -> E12:
    """(p^12-1)/r in three stages; easy part uses x^(p^6) = conj(x)."""
    p, r = tw.ts.p, tw.ts.r
    # easy part: f^(p^6 - 1) then ^(p^2 + 1)
    f = tw.e12_mul(tw.e12_conj(f), tw.e12_inverse(f))
    f = tw.e12_mul(tw.e12_frobenius(f, 2), f)
    # hard part (generic): ^((p^4 - p^2 + 1)/r)
    d = (p**4 - p**2 + 1) // r
    return tw.e12_pow(f, d)


def pair(tw: Tower, p: Affine, q: G2Affine) -> E12:
    """e(P, Q) batched (Pair, pairing.go:26)."""
    return final_exponentiation(tw, miller_loop(tw, p, q))


def pairing_check(tw: Tower, p: Affine, q: G2Affine):
    """Prod_i e(P_i, Q_i) == 1 (PairingCheck, pairing.go:38).  The batch axis
    of p/q is the product axis; returns a scalar bool."""
    f = miller_loop(tw, p, q)
    # elementwise product over the batch axis (tree fold)
    n = f.c0.b0.a0.shape[1]

    def take(x, sl):
        return jax.tree.map(lambda a: a[:, sl], x)

    m = n
    while m > 1:
        h = m // 2
        merged = tw.e12_mul(take(f, slice(0, h)), take(f, slice(h, 2 * h)))
        if m % 2:
            tail = take(f, slice(m - 1, m))
            first = tw.e12_mul(take(merged, slice(0, 1)), tail)
            merged = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b[:, 1:]], 1), first, merged
            )
        f = merged
        m = h
    f = jax.tree.map(lambda a: a[:, 0], f)
    out = final_exponentiation(tw, f)
    return tw.e12_is_one(out)


@functools.cache
def pairing_ctx(curve_name: str) -> Tower:
    return tower(curve_name)
