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
frobenius fold) + the family hard-part ladders of cyclotomic.py — including
the El Housni-Guillevic cofactors s = |x0+1| (bw6-761) and |x0^5-x0^4-x0| at
the SIGNED seed (bw6-633), so GT values are identical to gnark on every
family.
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


def _cubic_mul_sparse(st: PairingStack, cub, a, d: tuple):
    """a * (d0 + d1 v + d2 v^2) over the cubic with None entries structurally
    zero (schoolbook over nonzero coefficients)."""
    tf = st.tf
    nz = [(i, di) for i, di in enumerate(d) if di is not None]
    if len(nz) == 3:
        return cub.mul(a, cub.join(list(d)))
    comps = cub.split(a)
    acc = [None, None, None]
    for i, di in nz:
        for j, bj in enumerate(comps):
            p = tf.mul(bj, di)
            k = i + j
            if k >= 3:
                p = _mul_xi(st, p)
                k -= 3
            acc[k] = p if acc[k] is None else tf.add(acc[k], p)
    batch = comps[0].shape[1:]
    return cub.join([x if x is not None else tf.zeros(batch) for x in acc])


def mul_line(st: PairingStack, f: jax.Array, line: jax.Array) -> jax.Array:
    """f * line for a sparse line (3 nonzero w-coefficients: {0,1,3} D-twist,
    {0,3,5} M-twist) — the generic-stack analogue of MulBy034/MulBy014
    (fptower/e12_pairing.go:136): Karatsuba over the quadratic layer with
    sparse cubic sub-products, 15 tf muls vs 18 for the full mul."""
    K = st.full
    cub = K.base
    tf = st.tf
    A, B = K.split(f)
    if st.twist == "D":
        d0 = _w_block(K, tf, line, 0)
        d1 = _w_block(K, tf, line, 1)
        d3 = _w_block(K, tf, line, 3)
        t0 = _cubic_mul_sparse(st, cub, A, (d0, None, None))
        t1 = _cubic_mul_sparse(st, cub, B, (d1, d3, None))
        mid = _cubic_mul_sparse(st, cub, cub.add(A, B),
                                (tf.add(d0, d1), d3, None))
    else:
        d0 = _w_block(K, tf, line, 0)
        d3 = _w_block(K, tf, line, 3)
        d5 = _w_block(K, tf, line, 5)
        t0 = _cubic_mul_sparse(st, cub, A, (d0, None, None))
        t1 = _cubic_mul_sparse(st, cub, B, (None, d3, d5))
        mid = _cubic_mul_sparse(st, cub, cub.add(A, B), (d0, d3, d5))
    # (A + Bw)(C + Dw), w^2 = v: c0 = AC + v*BD, c1 = mid - AC - BD
    c0 = cub.add(t0, cub.mul_gen(t1))
    c1 = cub.sub(cub.sub(mid, t0), t1)
    return K.join([c0, c1])


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


@functools.cache
def _bw6_params(st: PairingStack):
    """Optimal-ate parameters for the BW6 2-dimensional Miller loop
    (ecc/bw6-761/pairing.go:130 MillerLoop, Alg. 2 of eprint 2021/1359):

      f_{a0 + lambda*a1, Q}  with  a0 = x0+1,
      a1 = x0^3-x0^2-x0 (bw6-761) or x0^5-x0^4-x0 (bw6-633),

    where lambda is the G2 eigenvalue of phi: (x,y) -> (omega*x, -y) and
    omega is the Fp cube root of unity picked so that a0 + lambda*a1 = 0
    mod r (verified on the host curve, fixing gnark's thirdRootOneG1
    convention without transcribing the constant)."""
    from ..curves.group import Group
    from ..towers.host import HostCurve
    from ..utils.glv import naf_decomposition

    x0 = st.seed
    a0 = x0 + 1
    if st.name == "bw6_761":
        a1 = x0**3 - x0**2 - x0
    else:
        a1 = x0**5 - x0**4 - x0
    p, r = st.p, st.r
    # the two primitive cube roots of unity in Fp
    g = 2
    while pow(g, (p - 1) // 3, p) == 1:
        g += 1
    w1 = pow(g, (p - 1) // 3, p)
    w2 = w1 * w1 % p
    lam = (-a0) * pow(a1, -1, r) % r
    hc = HostCurve(st.host_tf, st.host_tf.embed(st.b_twist)
                   if isinstance(st.b_twist, int) else st.b_twist)
    gen = st.g2_gen
    want = hc.mul(lam, gen)
    omega = None
    for w in (w1, w2):
        cand = (gen[0] * w % p, (-gen[1]) % p)
        if want == cand:
            omega = w
            break
    assert omega is not None, f"{st.name}: bw6 eigenvalue convention not found"

    def signed_naf(a: int):
        if a >= 0:
            return naf_decomposition(a)
        return [-d for d in naf_decomposition(-a)]

    d0, d1 = signed_naf(a0), signed_naf(a1)
    L = max(len(d0), len(d1))
    d0 = d0 + [0] * (L - len(d0))
    d1 = d1 + [0] * (L - len(d1))
    # ladder walks |a0 + lambda*a1|; when a1 < 0 negate both digit strings
    # and conjugate f afterwards (f_{-m} ~ conj(f_m) post-final-exp, the
    # reference's trailing Conjugate for "negative x0",
    # ecc/bw6-633/pairing.go MillerLoop tail)
    flip = d1[-1] == -1
    if flip:
        d0 = [-x for x in d0]
        d1 = [-x for x in d1]
    assert d1[-1] == 1 and d0[-1] == 0, "expected a1 MSB to lead the ladder"
    return omega, flip, np.array(d0[:-1], np.int32), np.array(d1[:-1], np.int32)


def _miller_loop_bw6(st: PairingStack, p: AffineF, q: AffineF) -> jax.Array:
    """BW6 optimal 2-loop Miller: joint ladder over q1 = phi(Q) = (omega x,
    -y) and q0 = Q driven by the NAF digits of (a1, a0) — value-identical to
    the reference's LoopCounter/LoopCounter1 walk (any signed-digit chain of
    the same (a0, a1) yields the same post-final-exp GT)."""
    K, tf, fp = st.full, st.tf, st.fp
    xp, yp = p.x, p.y
    batch = xp.shape[1:]
    omega, flip, d0, d1 = _bw6_params(st)

    w = tf.const(omega, batch)
    q1 = AffineF(tf.mul(q.x, w), tf.neg(q.y))
    f0 = K.one(batch)
    t0 = G2Proj(q1.x, q1.y, tf.one(batch))

    def body(carry, digs):
        dig0, dig1 = digs
        f, t = carry
        f = K.square(f)
        t, line = _double_step(st, t, xp, yp)
        f = mul_line(st, f, line)
        for dig, qq in ((dig1, q1), (dig0, q)):
            qa = AffineF(qq.x, tf.select(
                jnp.broadcast_to(dig < 0, batch), tf.neg(qq.y), qq.y))
            t_add, line_add = _add_step(st, t, qa, xp, yp)
            mask = jnp.broadcast_to(dig != 0, batch)
            f = K.select(mask, mul_line(st, f, line_add), f)
            t = G2Proj(
                tf.select(mask, t_add.x, t.x),
                tf.select(mask, t_add.y, t.y),
                tf.select(mask, t_add.z, t.z),
            )
        return (f, t), None

    digs = (jnp.asarray(d0[::-1].copy()), jnp.asarray(d1[::-1].copy()))
    (f, _), _ = jax.lax.scan(body, (f0, t0), digs)
    if flip:
        f = K.conj(f)

    p_inf = jnp.logical_and(fp.is_zero(xp), fp.is_zero(yp))
    q_inf = jnp.logical_and(tf.is_zero(q.x), tf.is_zero(q.y))
    inf = jnp.logical_or(p_inf, q_inf)
    return K.select(inf, K.one(batch), f)


def miller_loop(st: PairingStack, p: AffineF, q: AffineF) -> jax.Array:
    """Batched Miller loop f_{m,Q}(P); m per family (see module docstring).
    p: G1 affine (Fp coords); q: twist affine (tf coords)."""
    if st.family == "bw6":
        return _miller_loop_bw6(st, p, q)
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
        f = mul_line(st, f, line)
        t_add, line_add = _add_step(st, t, q, xp, yp)
        f_add = mul_line(st, f, line_add)
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
        f = mul_line(st, f, l1)
        t, l2 = _add_step(st, t, q2, xp, yp)
        f = mul_line(st, f, l2)
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
