"""Cyclotomic-subgroup arithmetic + family-specific final-exp hard parts.

Granger-Scott cyclotomic squaring (E12.CyclotomicSquare,
ecc/bn254/internal/fptower/e12.go:110-143) genericized over any
full = tf[w]/(w^6 - xi) pairing field (k in {6, 12, 24}), plus the
reference's per-family hard-part ladders so GT outputs are value-identical
to gnark:

- BN: Fuentes et al. ladder, exponent 2x0(6x0^2+3x0+1)*(p^4-p^2+1)/r
  (ecc/bn254/pairing.go:52-106, eprint 2015/192 alg. 6).
- BLS12: Hayashida-Hayasaka-Teruya ladder, exponent 3(p^4-p^2+1)/r
  (ecc/bls12-381/pairing.go, eprint 2020/875).
- BLS24: HHT ladder, exponent 3(p^8-p^4+1)/r (ecc/bls24-315/pairing.go).
- BW6: generic Phi_6(p)/r exponent with cyclotomic squares (the reference's
  Alg. 4.4 seed-ladder is a later optimization; exponent differs from
  gnark's by a fixed coprime multiple, see ate.py docstring).

Seed exponentiations (Expt / ExptHalf) use plain square-and-multiply with
cyclotomic squares — same group element as the reference's Karabina
compressed-squaring chains (fptower/e12_pairing.go:16), different schedule.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _blocks(st, f):
    """Split a full-field element into 6 tf coefficients by w-power.
    Flat layout: full = Quad(Cubic(tf)) so block j holds w-power
    (j % 3) * 2 + (j // 3) (towers/stacks.py _sextic)."""
    L = st.tf.L
    by_block = [f[i * L:(i + 1) * L] for i in range(6)]
    g = [None] * 6
    for j in range(6):
        g[(j % 3) * 2 + (j // 3)] = by_block[j]
    return g


def _from_blocks(st, g):
    order = [g[(j % 3) * 2 + (j // 3)] for j in range(6)]
    return jnp.concatenate(order, axis=0)


def _mul_xi(st, x):
    tf = st.tf
    if isinstance(st.xi, int):
        return tf.mul_small(x, st.xi)
    if hasattr(tf, "mul_gen") and tf.host.eq(st.xi, tf.host.gen()):
        return tf.mul_gen(x)
    return tf.mul(x, tf.const(st.xi, ()))


def cyclotomic_square(st, f):
    """Granger-Scott squaring, valid for elements of the cyclotomic subgroup
    G_{Phi_6(q)} of full^* (e12.go:110 CyclotomicSquare, genericized)."""
    tf = st.tf
    g = _blocks(st, f)
    # Fp4 pairs (g0,g3), (g1,g4), (g2,g5) with s^2 = xi
    t0 = tf.square(g[3])
    t1 = tf.square(g[0])
    t6 = tf.sub(tf.sub(tf.square(tf.add(g[3], g[0])), t0), t1)   # 2 g0 g3
    t2 = tf.square(g[4])
    t3 = tf.square(g[1])
    t7 = tf.sub(tf.sub(tf.square(tf.add(g[4], g[1])), t2), t3)   # 2 g1 g4
    t4 = tf.square(g[5])
    t5 = tf.square(g[2])
    t8 = _mul_xi(st, tf.sub(tf.sub(tf.square(tf.add(g[5], g[2])), t4), t5))

    t0 = tf.add(_mul_xi(st, t0), t1)    # g0^2 + xi g3^2
    t2 = tf.add(_mul_xi(st, t2), t3)    # g1^2 + xi g4^2
    t4 = tf.add(_mul_xi(st, t4), t5)    # g2^2 + xi g5^2

    out = [None] * 6
    out[0] = tf.add(tf.double(tf.sub(t0, g[0])), t0)
    out[2] = tf.add(tf.double(tf.sub(t2, g[2])), t2)
    out[4] = tf.add(tf.double(tf.sub(t4, g[4])), t4)
    out[1] = tf.add(tf.double(tf.add(t8, g[1])), t8)
    out[3] = tf.add(tf.double(tf.add(t6, g[3])), t6)
    out[5] = tf.add(tf.double(tf.add(t7, g[5])), t7)
    return _from_blocks(st, out)


def pow_cyc(st, f, e: int):
    """f^e for a host integer on a cyclotomic element: square-and-multiply
    with cyclotomic squares; negative exponents via conjugation (unitary
    inverse, e12.go InverseUnitary)."""
    K = st.full
    if e < 0:
        return K.conj(pow_cyc(st, f, -e))
    if e == 0:
        return K.one(f.shape[1:])
    bits = bin(e)[2:]
    if len(bits) <= 8:
        r = f
        for bit in bits[1:]:
            r = cyclotomic_square(st, r)
            if bit == "1":
                r = K.mul(r, f)
        return r
    import jax

    bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

    def body(res, bit):
        res = cyclotomic_square(st, res)
        res = K.select(jnp.broadcast_to(bit, res.shape[1:]), K.mul(res, f), res)
        return res, None

    out, _ = jax.lax.scan(body, f, bit_arr)
    return out


def expt(st, f):
    """f^seed (signed) — the reference's Expt (e12_pairing.go:16)."""
    return pow_cyc(st, f, st.seed)


def hard_part(st, f):
    """Family dispatch for the hard part of the final exponentiation.
    Input must already be in the cyclotomic subgroup (easy part applied)."""
    if st.family == "bn":
        return _hard_bn(st, f)
    if st.family == "bls12":
        return _hard_bls12(st, f)
    if st.family == "bls24":
        return _hard_bls24(st, f)
    # bw6: gnark exponentiates by s * Phi_6(p)/r with the El Housni-Guillevic
    # cofactor s (ecc/bw6-761/pairing.go:58-62: s = x0+1, Alg 4.4;
    # ecc/bw6-633/pairing.go:51: s = |x0^5-x0^4-x0| at the SIGNED seed
    # x0 = -3218079743, Alg 4.5 — bw6-633.go:102 gives the positive value
    # 345131030376204096837580131803633448876874137601 = u^5+u^4-u).
    # Same exponent as the reference's ladder -> GT bytes match gnark; the
    # seed-ladder schedule itself is a later speed optimization.
    x0 = st.seed
    s = abs(x0 + 1) if st.name == "bw6_761" else abs(x0**5 - x0**4 - x0)
    return pow_cyc(st, f, s * st.final_exp_hard)


def _hard_bn(st, m):
    """Fuentes et al. ladder (ecc/bn254/pairing.go:78-105), exponent
    2x0(6x0^2+3x0+1)(p^4-p^2+1)/r.  NB gnark's Expt is by |x0| (x0 > 0)."""
    K = st.full
    t0 = K.conj(expt(st, m))
    t0 = cyclotomic_square(st, t0)
    t1 = cyclotomic_square(st, t0)
    t1 = K.mul(t0, t1)
    t2 = K.conj(expt(st, t1))
    t3 = K.conj(t1)
    t1 = K.mul(t2, t3)
    t3 = cyclotomic_square(st, t2)
    t4 = expt(st, t3)
    t4 = K.mul(t1, t4)
    t3 = K.mul(t0, t4)
    t0 = K.mul(t2, t4)
    t0 = K.mul(m, t0)
    t2 = K.frobenius(t3, 1)
    t0 = K.mul(t2, t0)
    t2 = K.frobenius(t4, 2)
    t0 = K.mul(t2, t0)
    t2 = K.conj(m)
    t2 = K.mul(t2, t3)
    t2 = K.frobenius(t2, 3)
    return K.mul(t2, t0)


def _hard_bls12(st, m):
    """Hayashida-Hayasaka-Teruya ladder (ecc/bls12-377/pairing.go), exponent
    3(p^4-p^2+1)/r = (x0-1)^2 (x0+p)(x0^2+p^2-1) + 3."""
    K = st.full
    t0 = cyclotomic_square(st, m)
    t1 = expt(st, m)
    t2 = K.conj(m)
    t1 = K.mul(t1, t2)
    t2 = expt(st, t1)
    t1 = K.conj(t1)
    t1 = K.mul(t1, t2)
    t2 = expt(st, t1)
    t1 = K.frobenius(t1, 1)
    t1 = K.mul(t1, t2)
    m = K.mul(m, t0)
    t0 = expt(st, t1)
    t2 = expt(st, t0)
    t0 = K.frobenius(t1, 2)
    t1 = K.conj(t1)
    t1 = K.mul(t1, t2)
    t1 = K.mul(t1, t0)
    return K.mul(m, t1)


def _hard_bls24(st, m):
    """HHT ladder for BLS24 (ecc/bls24-315/pairing.go), exponent
    3(p^8-p^4+1)/r = (x0-1)^2 (x0+p)(x0^2+p^2)(x0^4+p^4-1) + 3."""
    K = st.full
    t0 = cyclotomic_square(st, m)
    t1 = expt(st, m)
    t2 = K.conj(m)
    t1 = K.mul(t1, t2)
    t2 = expt(st, t1)
    t1 = K.conj(t1)
    t1 = K.mul(t1, t2)
    t2 = expt(st, t1)
    t1 = K.frobenius(t1, 1)
    t1 = K.mul(t1, t2)
    m = K.mul(m, t0)
    t0 = expt(st, t1)
    t2 = expt(st, t0)
    t0 = K.frobenius(t1, 2)
    t2 = K.mul(t0, t2)
    t1 = expt(st, t2)
    t1 = expt(st, t1)
    t1 = expt(st, t1)
    t1 = expt(st, t1)
    t0 = K.frobenius(t2, 4)
    t0 = K.mul(t0, t1)
    t2 = K.conj(t2)
    t0 = K.mul(t0, t2)
    return K.mul(m, t0)
