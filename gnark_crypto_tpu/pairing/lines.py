"""Fixed-Q pairing: host-precomputed Miller-loop lines.

The analogue of the reference's PrecomputeLines / PairFixedQ
(ecc/bn254/pairing.go:26-457 lineEvaluation tables): when the G2 argument is
fixed (KZG verification always pairs against vk's G2 and [tau]G2), the
Miller loop's line coefficients depend only on Q, so they are computed ONCE
host-side with exact big-int tower arithmetic and the device loop reduces to
squarings + sparse line multiplications — no G2 arithmetic on the hot path.

A line through the walk is l(P) = yP - lam*xP + (lam*xq - yq), stored as the
slot pair (a1, a3) = (-lam, lam*xq - yq) with a0 = 1 (lines are projective:
any Fp* scale cancels in the final exponentiation, so the affine chord /
tangent parameterization is value-identical to the projective device steps).

Supported families: bn (psi tail via host conjugation — tf is quadratic),
bls12, bls24 (no tail).  bw6's 2-dimensional loop keeps the generic path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.group import AffineF
from .ate import _batch_product, _line_sparse, final_exponentiation, mul_line


class FixedQLines(NamedTuple):
    """Per-step line coefficient arrays, batch axis last.

    dbl_a1/dbl_a3: (n_bits, L_tf, B); add_a1/add_a3: same (zero rows where
    the bit is 0 — masked out like the generic loop's unselected add)."""

    dbl_a1: np.ndarray
    dbl_a3: np.ndarray
    add_a1: np.ndarray
    add_a3: np.ndarray


def _flatten_host(spec, v) -> list:
    """Host tower element (nested int tuples) -> flat Montgomery 16-bit limb
    vector in the device tower layout (coefficient-major, depth-first)."""
    if isinstance(v, (tuple, list)):
        out = []
        for c in v:
            out.extend(_flatten_host(spec, c))
        return out
    return [int(x) for x in np.asarray(spec.spec.mont_limbs(int(v)))]


def supports_fixed_q(st) -> bool:
    return st.family in ("bn", "bls12", "bls24")


@functools.cache
def _loop_bits(st) -> tuple:
    return tuple(c == "1" for c in bin(abs(st.loop_const))[3:])


def precompute_lines(st, q_host) -> FixedQLines:
    """Walk the Miller loop for one host Q = (x, y) (tf coordinates) and
    collect the line coefficients (PrecomputeLines, bn254/pairing.go:96)."""
    assert supports_fixed_q(st), f"no fixed-Q path for family {st.family}"
    h = st.host_tf
    spec = st.fp
    bits = _loop_bits(st)

    def tangent(t):
        x, y = t
        lam = h.mul(h.mul_small(h.square(x), 3), h.inv(h.mul_small(y, 2)))
        x3 = h.sub(h.square(lam), h.mul_small(x, 2))
        y3 = h.sub(h.mul(lam, h.sub(x, x3)), y)
        return (x3, y3), (h.neg(lam), h.sub(h.mul(lam, x), y))

    def chord(t, q):
        x1, y1 = t
        x2, y2 = q
        lam = h.mul(h.sub(y2, y1), h.inv(h.sub(x2, x1)))
        x3 = h.sub(h.sub(h.square(lam), x1), x2)
        y3 = h.sub(h.mul(lam, h.sub(x1, x3)), y1)
        return (x3, y3), (h.neg(lam), h.sub(h.mul(lam, x2), y2))

    t = q_host
    dbl, add = [], []
    zero = (h.zero(), h.zero())
    for b in bits:
        t, ln = tangent(t)
        dbl.append(ln)
        if b:
            t, ln = chord(t, q_host)
            add.append(ln)
        else:
            add.append(zero)

    if st.family == "bn":
        # two Frobenius add steps: psi(Q) then psi^2(Q) with negated y
        # (_g2_psi; tf is quadratic so host frobenius = conjugation)
        xi = st.xi if not isinstance(st.xi, int) else h.embed(st.xi)
        extra = []
        for power, negy in ((1, False), (2, True)):
            e = (st.p ** power - 1) // 6
            g = h.pow(xi, e)
            if st.twist == "M":
                g = h.inv(g)
            g2c = h.mul(g, g)
            g3c = h.mul(g2c, g)
            frob = h.conj if power % 2 else (lambda a: a)
            qq = (h.mul(frob(q_host[0]), g2c), h.mul(frob(q_host[1]), g3c))
            if negy:
                qq = (qq[0], h.neg(qq[1]))
            t, ln = chord(t, qq)
            extra.append(ln)
        # ride the tail as two always-on "add" steps with identity doubles
        dbl.append((h.zero(), h.zero()))
        add.append(extra[0])
        dbl.append((h.zero(), h.zero()))
        add.append(extra[1])

    flat = lambda lines, j: np.array(
        [_flatten_host(spec, ln[j]) for ln in lines], np.uint32)
    return FixedQLines(flat(dbl, 0), flat(dbl, 1), flat(add, 0), flat(add, 1))


def stack_lines(lines_list) -> FixedQLines:
    """Stack per-Q line tables on a trailing batch axis."""
    return FixedQLines(*(
        np.stack([getattr(l, f) for l in lines_list], axis=-1)
        for f in FixedQLines._fields))


def miller_loop_fixed(st, p: AffineF, lines: FixedQLines) -> jax.Array:
    """Batched Miller loop consuming precomputed lines (MillerLoopFixedQ,
    bn254/pairing.go:457).  p: G1 affine, batch B matching the lines'."""
    K, tf, fp = st.full, st.tf, st.fp
    xp, yp = p.x, p.y
    batch = xp.shape[1:]
    bits = _loop_bits(st)
    n_bits = len(bits)
    has_add = np.array(list(bits), np.bool_)
    if st.family == "bn":
        # tail steps appended by precompute_lines: double is an identity
        # (zero line would corrupt f — flag them square-free instead)
        has_add = np.concatenate([has_add, np.array([True, True])])
        sq = np.concatenate([np.ones(n_bits, np.bool_),
                             np.zeros(2, np.bool_)])
    else:
        sq = np.ones(n_bits, np.bool_)

    f0 = K.one(batch)
    a0 = tf.one(batch)

    def body(f, step):
        d1, d3, a1, a3, do_sq, do_add = step
        fsq = K.square(f)
        f = K.select(jnp.broadcast_to(do_sq, batch), fsq, f)
        fd = mul_line(st, f, _line_sparse(st, a0, d1, d3, xp, yp))
        f = K.select(jnp.broadcast_to(do_sq, batch), fd, f)
        fa = mul_line(st, f, _line_sparse(st, a0, a1, a3, xp, yp))
        f = K.select(jnp.broadcast_to(do_add, batch), fa, f)
        return f, None

    steps = (jnp.asarray(lines.dbl_a1), jnp.asarray(lines.dbl_a3),
             jnp.asarray(lines.add_a1), jnp.asarray(lines.add_a3),
             jnp.asarray(sq), jnp.asarray(has_add))
    f, _ = jax.lax.scan(body, f0, steps)

    if st.family != "bn" and st.loop_const < 0:
        f = K.conj(f)
    p_inf = jnp.logical_and(fp.is_zero(xp), fp.is_zero(yp))
    return K.select(p_inf, K.one(batch), f)


def pairing_check_fixed(st, p: AffineF, lines: FixedQLines):
    """prod_i e(P_i, Q_i) == 1 for fixed Qs (PairingCheckFixedQ)."""
    K = st.full
    f = miller_loop_fixed(st, p, lines)
    f = _batch_product(K, f)
    return K.eq(final_exponentiation(st, f), K.one(()))
