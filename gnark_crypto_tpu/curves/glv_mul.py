"""GLV scalar multiplication — endomorphism-split double-and-add at half
depth (mulGLV, ecc/bn254/g1.go:529; phi :520; SplitScalar ecc/utils.go:142).

TPU-first difference from the reference: the lattice rounding runs ON DEVICE
over the whole scalar batch with vectorized 16-bit limb big-int ops
(fields/bigint.py) instead of per-scalar math/big host calls; the two
half-width parts then drive one Strauss-Shamir joint ladder
(curves/point.py joint_scalar_mul) against P and phi(P) = (beta*x, y).

Exactness: the split uses truncating division instead of the reference's
round-to-nearest — u + v*lambda = s (mod r) holds for ANY k1, k2 by the
lattice property (w0 + w1*lambda = 0 mod r), truncation only costs at most
one extra bit in |u|, |v|, absorbed by the ladder-width margin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bigint, mont
from ..fields.spec import LIMB_BITS
from ..utils.glv import precompute_lattice
from .point import Affine, Jac, affine_select, jac_neg, joint_scalar_mul
from .spec import CurveSpec


@functools.cache
def _glv_ctx(cs: CurveSpec):
    lam, beta = cs.glv
    lat = precompute_lattice(cs.fr.modulus, lam)
    half_bits = max(
        abs(lat.v1[0]).bit_length(), abs(lat.v1[1]).bit_length(),
        abs(lat.v2[0]).bit_length(), abs(lat.v2[1]).bit_length(),
    ) + 2
    return lat, beta, half_bits


def _mul_const_shift(s: jax.Array, c: int, shift_bits: int, out_limbs: int):
    """trunc((s * c) / 2^shift) for a host constant c >= 0."""
    assert shift_bits % LIMB_BITS == 0
    nc = max(1, -(-c.bit_length() // LIMB_BITS))
    cl = bigint.from_int(c, nc, s.shape[1:])
    prod = bigint.mul(s, cl)
    out = bigint.shift_right_limbs(prod, shift_bits // LIMB_BITS)
    return out[:out_limbs] if out.shape[0] >= out_limbs else jnp.concatenate(
        [out, jnp.zeros((out_limbs - out.shape[0],) + out.shape[1:], jnp.uint32)], 0
    )


def split_scalar_device(cs: CurveSpec, s: jax.Array):
    """Batched SplitScalar: s (fr limbs, plain) -> (|u|, u_neg, |v|, v_neg)
    with u + v*lambda = s mod r and |u|, |v| < 2^half_bits."""
    lat, _, half_bits = _glv_ctx(cs)
    W = s.shape[0] + 2                      # working width, two's complement
    batch = s.shape[1:]

    def widen(a):
        pad = W - a.shape[0]
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], jnp.uint32)], 0
        ) if pad > 0 else a[:W]

    k_limbs = -(-half_bits // LIMB_BITS) + 1
    k1 = _mul_const_shift(s, abs(lat.b1), lat.shift, k_limbs)
    k2 = _mul_const_shift(s, abs(lat.b2), lat.shift, k_limbs)
    s1 = 1 if lat.b1 >= 0 else -1           # sign of k1
    s2 = -1 if lat.b2 >= 0 else 1           # k2 = -(s*b2) >> shift

    def term(k, sign_k, v: int):
        """signed k * v as W-limb two's complement."""
        mag = bigint.mul(k, bigint.from_int(abs(v), -(-abs(v).bit_length() // LIMB_BITS) or 1, batch))
        mag = widen(mag)
        if sign_k * (1 if v >= 0 else -1) >= 0:
            return mag, False
        return mag, True

    def acc_sub(acc, t, negate):
        if negate:
            out, _ = bigint.sub(acc, t)
        else:
            out = bigint.add(acc, t)
        return out

    # u = s - (k1 v1[0] + k2 v2[0]);  v = -(k1 v1[1] + k2 v2[1])
    u = widen(s)
    for k, sk, vv in ((k1, s1, lat.v1[0]), (k2, s2, lat.v2[0])):
        if vv == 0:
            continue
        t, neg = term(k, sk, vv)
        u = acc_sub(u, t, not neg)          # subtract the signed term
    v = jnp.zeros((W,) + batch, jnp.uint32)
    for k, sk, vv in ((k1, s1, lat.v1[1]), (k2, s2, lat.v2[1])):
        if vv == 0:
            continue
        t, neg = term(k, sk, vv)
        v = acc_sub(v, t, not neg)

    def to_sign_mag(x):
        neg = bigint.bit(x, W * LIMB_BITS - 1)
        comp, _ = bigint.sub(jnp.zeros_like(x), x)
        mag = jnp.where(neg[None], comp, x)
        return mag, neg

    u_mag, u_neg = to_sign_mag(u)
    v_mag, v_neg = to_sign_mag(v)
    nk = -(-half_bits // LIMB_BITS)
    return u_mag[:nk], u_neg, v_mag[:nk], v_neg


def phi(cs: CurveSpec, a: Affine) -> Affine:
    """The cube-root endomorphism (x, y) -> (beta x, y) (g1.go:520)."""
    _, beta, _ = _glv_ctx(cs)
    f = cs.fp
    b = mont.const(f, beta, ()).reshape(f.n_limbs, *([1] * (a.x.ndim - 1)))
    return Affine(mont.mul(f, a.x, b), a.y)


def scalar_mul_glv(cs: CurveSpec, base: Affine, scalars: jax.Array) -> Jac:
    """[s]P via GLV split + Strauss-Shamir joint ladder — half the doubling
    depth of curves/point.py scalar_mul (mulGLV, g1.go:529)."""
    _, _, half_bits = _glv_ctx(cs)
    u_mag, u_neg, v_mag, v_neg = split_scalar_device(cs, scalars)
    pu = affine_select(u_neg, Affine(base.x, mont.neg(cs.fp, base.y)), base)
    p2 = phi(cs, base)
    pv = affine_select(v_neg, Affine(p2.x, mont.neg(cs.fp, p2.y)), p2)
    return joint_scalar_mul(cs, pu, pv, u_mag, v_mag, nbits=half_bits)
