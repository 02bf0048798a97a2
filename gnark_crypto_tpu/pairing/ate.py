"""Generic batched ate pairing over any sextic-twist pairing stack.

One implementation for every family the reference covers with per-curve code:

  bls12 (ecc/bls12-381/pairing.go) : f_{|x|,Q}(P), conj if x < 0
  bls24 (ecc/bls24-315/pairing.go) : f_{|x|,Q}(P), conj if x < 0
  bw6   (ecc/bw6-761/pairing.go)   : plain ate f_{T,Q}(P), T = p mod r
  bn    (ecc/bn254/pairing.go)     : f_{6x+2,Q}(P) + two Frobenius add steps

The full field is always tf[w]/(w^6 - xi) (towers/stacks.py), so the line
function is sparse with three tf coefficients in fixed w-power slots:
  D-twist: l = A0*yP + A1*xP w + A3 w^3
  M-twist: l = xi*A0*yP + A3 w^3 + A1*xP w^5
(same slots as the specialized bn/bls12 path in pairing/pairing.py; sparse
mul fusion a la MulBy034 / fptower/e24_pairing.go is a later optimization).

Final exponentiation: generic easy part (f^(p^{k/2}-1) via conj, then
frobenius fold) + scanned hard part Phi_k(p)/r.  NOTE for bw6: gnark
exponentiates by (x0+1)*Phi_6(p)/r (Algorithm 4.4, El Housni's thesis) — a
fixed coprime multiple of our exponent, so PairingCheck/bilinearity semantics
agree but raw GT bytes differ from gnark on that family.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.group import AffineF
from ..towers.ext import pow_host
from ..towers.stacks import PairingStack, stack


def _w_block(K, tf, a_full, k):
    """Slice of w-power k (a tf element) in the flat full-field layout."""
    blk = (k % 2) * 3 + k // 2
    return a_full[blk * tf.L:(blk + 1) * tf.L]


def sparse_line(st: PairingStack, entries: dict, batch) -> jax.Array:
    """Build a full-field element from {w_power: tf element}."""
    K, tf = st.full, st.tf
    blocks = [tf.zeros(batch)] * 6
    for k, v in entries.items():
        blocks[(k % 2) * 3 + k // 2] = v
    # flat layout order is block index 0..5
    return jnp.concatenate(blocks, axis=0)


def _mul_xi(st: PairingStack, x):
    """x * xi in the twist field (xi = sextic nonresidue, host element)."""
    tf = st.tf
    xi = st.xi
    if isinstance(xi, int):
        return tf.mul_small(x, xi)
    if hasattr(tf, "mul_gen") and tf.host.eq(xi, tf.host.gen()):
        return tf.mul_gen(x)
    return tf.mul(x, tf.const(xi, ()))


def _line_sparse(st: PairingStack, a0, a1, a3, xp, yp) -> jax.Array:
    tf = st.tf
    c_y = tf.mul_fp(a0, yp)
    c_x = tf.mul_fp(a1, xp)
    batch = xp.shape[1:]
    if st.twist == "D":
        return sparse_line(st, {0: c_y, 1: c_x, 3: a3}, batch)
    return sparse_line(st, {0: _mul_xi(st, c_y), 3: a3, 5: c_x}, batch)


class G2Proj(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


def _double_step(st: PairingStack, t: G2Proj, xp, yp):
    """Projective doubling + tangent line (pairing.py _double_step, generic)."""
    tf = st.tf
    X, Y, Z = t
    X2 = tf.square(X)
    Y2 = tf.square(Y)
    Z2 = tf.square(Z)
    W = tf.mul_small(X2, 3)
    S = tf.mul(Y, Z)
    B = tf.mul(tf.mul(X, Y), S)
    H = tf.sub(tf.square(W), tf.mul_small(B, 8))
    S2 = tf.square(S)
    x3 = tf.mul_small(tf.mul(H, S), 2)
    y3 = tf.sub(
        tf.mul(W, tf.sub(tf.mul_small(B, 4), H)),
        tf.mul_small(tf.mul(Y2, S2), 8),
    )
    z3 = tf.mul_small(tf.mul(S, S2), 8)
    a0 = tf.mul_small(tf.mul(Y, Z2), 2)
    a1 = tf.neg(tf.mul(W, Z))
    a3 = tf.sub(tf.mul(W, X), tf.mul_small(tf.mul(Y2, Z), 2))
    line = _line_sparse(st, a0, a1, a3, xp, yp)
    return G2Proj(x3, y3, z3), line


def _add_step(st: PairingStack, t: G2Proj, q: AffineF, xp, yp):
    """Projective mixed addition + chord line."""
    tf = st.tf
    X, Y, Z = t
    theta = tf.sub(Y, tf.mul(q.y, Z))
    lam = tf.sub(X, tf.mul(q.x, Z))
    lam2 = tf.square(lam)
    lam3 = tf.mul(lam2, lam)
    Wq = tf.sub(
        tf.mul(tf.square(theta), Z),
        tf.mul(lam2, tf.add(X, tf.mul(q.x, Z))),
    )
    x3 = tf.mul(lam, Wq)
    y3 = tf.sub(
        tf.mul(theta, tf.sub(tf.mul(X, lam2), Wq)),
        tf.mul(Y, lam3),
    )
    z3 = tf.mul(lam3, Z)
    a0 = lam
    a1 = tf.neg(theta)
    a3 = tf.sub(tf.mul(theta, q.x), tf.mul(lam, q.y))
    line = _line_sparse(st, a0, a1, a3, xp, yp)
    return G2Proj(x3, y3, z3), line


def _g2_psi(st: PairingStack, q: AffineF, power: int) -> AffineF:
    """Untwist-Frobenius-twist endomorphism on twist coordinates (BN family
    Frobenius add steps): psi^i(x, y) = (frob^i(x) * cx, frob^i(y) * cy) with
    cx = xi^(-2(p^i-1)/6), cy = xi^(-3(p^i-1)/6) for a D-twist (inverse powers
    for M)."""
    tf = st.tf
    h = tf.host
    p = st.p
    assert (p**power - 1) % 6 == 0
    e = (p**power - 1) // 6
    xi = st.xi if not isinstance(st.xi, int) else h.embed(st.xi)
    g = h.pow(xi, e)
    if st.twist == "M":
        g = h.inv(g)
    g2c = h.mul(g, g)
    g3c = h.mul(g2c, g)
    x = tf.frobenius(q.x, power)
    y = tf.frobenius(q.y, power)
    x = tf.mul(x, tf.const(g2c, ()))
    y = tf.mul(y, tf.const(g3c, ()))
    return AffineF(x, y)


def miller_loop(st: PairingStack, p: AffineF, q: AffineF) -> jax.Array:
    """Batched Miller loop f_{m,Q}(P); m per family (see module docstring).
    p: G1 affine (Fp coords); q: twist affine (tf coords)."""
    K, tf, fp = st.full, st.tf, st.fp
    xp, yp = p.x, p.y
    batch = xp.shape[1:]
    m = st.loop_const
    bits = np.array([c == "1" for c in bin(abs(m))[3:]], dtype=np.bool_)

    f0 = K.one(batch)
    t0 = G2Proj(q.x, q.y, tf.one(batch))

    def body(carry, bit):
        f, t = carry
        f = K.square(f)
        t, line = _double_step(st, t, xp, yp)
        f = K.mul(f, line)
        t_add, line_add = _add_step(st, t, q, xp, yp)
        f_add = K.mul(f, line_add)
        mask = jnp.broadcast_to(bit, batch)
        f = K.select(mask, f_add, f)
        t = G2Proj(
            tf.select(mask, t_add.x, t.x),
            tf.select(mask, t_add.y, t.y),
            tf.select(mask, t_add.z, t.z),
        )
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f0, t0), jnp.asarray(bits))

    if st.family == "bn":
        q1 = _g2_psi(st, q, 1)
        q2 = _g2_psi(st, q, 2)
        q2 = AffineF(q2.x, tf.neg(q2.y))
        t, l1 = _add_step(st, t, q1, xp, yp)
        f = K.mul(f, l1)
        t, l2 = _add_step(st, t, q2, xp, yp)
        f = K.mul(f, l2)
    elif m < 0:
        f = K.conj(f)

    p_inf = jnp.logical_and(fp.is_zero(xp), fp.is_zero(yp))
    q_inf = jnp.logical_and(tf.is_zero(q.x), tf.is_zero(q.y))
    inf = jnp.logical_or(p_inf, q_inf)
    return K.select(inf, K.one(batch), f)


def final_exponentiation(st: PairingStack, f: jax.Array) -> jax.Array:
    """Easy part + family hard-part ladder (value-identical to the
    reference's FinalExponentiation for bn/bls12/bls24; see cyclotomic.py)."""
    from .cyclotomic import hard_part

    K = st.full
    # easy: f^(p^{k/2} - 1) via top-level conjugation, then ^(p^{k/6} + 1)
    f = K.mul(K.conj(f), K.inverse(f))
    f = K.mul(K.frobenius(f, st.embedding_degree // 6), f)
    # hard: cyclotomic-subgroup ladder (exponent = fixed multiple of Phi_k(p)/r)
    return hard_part(st, f)


def pair(st: PairingStack, p: AffineF, q: AffineF) -> jax.Array:
    """e(P, Q) batched (per-curve Pair, e.g. ecc/bls24-315/pairing.go)."""
    return final_exponentiation(st, miller_loop(st, p, q))


def _batch_product(K, f):
    """Tree-fold product over the (single) batch axis of a full-field array."""
    m = f.shape[1]
    while m > 1:
        h = m // 2
        merged = K.mul(f[:, :h], f[:, h:2 * h])
        if m % 2:
            first = K.mul(merged[:, :1], f[:, m - 1:m])
            merged = jnp.concatenate([first, merged[:, 1:]], axis=1)
        f = merged
        m = h
    return f[:, 0]


def pairing_check(st: PairingStack, p: AffineF, q: AffineF):
    """prod_i e(P_i, Q_i) == 1 (PairingCheck)."""
    K = st.full
    f = miller_loop(st, p, q)
    f = _batch_product(K, f)
    out = final_exponentiation(st, f)
    return K.eq(out, K.one(()))


def gt_is_in_subgroup(st: PairingStack, x: jax.Array):
    """GT membership: x^r == 1 and x in the cyclotomic subgroup
    (x^{Phi_k(p)} == 1) — E12.IsInSubGroup analogue (fptower/e12.go:723)."""
    K = st.full
    one = K.one(x.shape[1:])
    # cyclotomic: x^(p^{k/6}+1) == x^(p^{k/2}) * ... simpler: x^{Phi_k(p)} = 1
    # Phi_k(p) = r * hard_part
    cyc = K.eq(pow_host(K, pow_host(K, x, st.r), st.final_exp_hard), one)
    return cyc


@functools.cache
def pairing_stack(curve_name: str) -> PairingStack:
    return stack(curve_name)
