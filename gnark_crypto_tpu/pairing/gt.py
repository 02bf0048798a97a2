"""GT (cyclotomic-subgroup) utilities: Karabina compressed squaring, torus
compression, and subgroup membership.

Parity targets in the reference:
  - CyclotomicSquareCompressed / DecompressKarabina / BatchDecompressKarabina
    (ecc/bn254/internal/fptower/e12.go:133, :217, :287 — eprint 2010/542
    Th. 3.2/3.1), including gnark's exact decompression branch structure;
  - CompressTorus / DecompressTorus (e12.go:742, :792 — Rubin-Silverberg);
  - IsInSubGroup GT membership (e12.go:723).

TPU note on the hot path: the reference uses Karabina squares inside Expt
because its CPU inversion (ext-GCD) is cheap, so one decompression per
square-run wins.  Here inversion is a Fermat exponentiation (~380 serial
multiplications — SURVEY.md §7 hard part #4), which costs more than the
3 tf-muls/square the compression saves over a typical seed chain, so
`cyclotomic.pow_cyc` keeps Granger-Scott squares for Expt; these entry points
provide the API (and byte-identical values) for users who compress GT state
for storage/transmission — where compression is about SIZE, not speed.

Block mapping: flat full-field elements are w-power blocks (towers/stacks.py);
gnark's E12 coefficient slots map to w-powers as C0.B0=w^0, C1.B0=w^1,
C0.B1=w^2, C1.B1=w^3, C0.B2=w^4, C1.B2=w^5.
"""

from __future__ import annotations

import jax.numpy as jnp

from .cyclotomic import _blocks, _from_blocks, _mul_xi, cyclotomic_square, expt


def cyclotomic_square_compressed(st, f):
    """Karabina compressed cyclotomic square (e12.go:133).

    Reads/writes only the w^1, w^2, w^4, w^5 blocks (gnark's g3, g1, g2, g5);
    the w^0 and w^3 blocks pass through stale and are reconstructed by
    decompress_karabina."""
    tf = st.tf
    b = _blocks(st, f)
    g1, g2, g3, g5 = b[2], b[4], b[1], b[5]

    t0 = tf.square(g1)
    t1 = tf.square(g5)
    t5 = tf.sub(tf.square(tf.add(g1, g5)), tf.add(t0, t1))   # 2 g1 g5
    t3 = tf.square(tf.add(g3, g2))
    t2 = tf.square(g3)

    t6 = _mul_xi(st, t5)                                      # 2 nr g1 g5
    z3 = tf.add(tf.double(tf.add(t6, g3)), t6)                # 6 nr g1 g5 + 2 g3

    t4 = _mul_xi(st, t1)
    t5b = tf.add(t0, t4)                                      # g1^2 + nr g5^2
    t6b = tf.sub(t5b, g2)
    t1b = tf.square(g2)
    z2 = tf.add(tf.double(t6b), t5b)                          # 3(g1^2+nr g5^2) - 2g2

    t4b = _mul_xi(st, t1b)
    t5c = tf.add(t2, t4b)                                     # g3^2 + nr g2^2
    t6c = tf.sub(t5c, g1)
    z1 = tf.add(tf.double(t6c), t5c)                          # 3(g3^2+nr g2^2) - 2g1

    t5d = tf.sub(t3, tf.add(t2, t1b))                         # 2 g3 g2
    z5 = tf.add(t5d, tf.double(tf.add(t5d, g5)))              # 6 g3 g2 + 2 g5

    out = list(b)
    out[1], out[2], out[4], out[5] = z3, z1, z2, z5
    return _from_blocks(st, out)


def decompress_karabina(st, f):
    """Reconstruct the w^3 (g4) and w^0 (g0) blocks after compressed squaring
    (DecompressKarabina, e12.go:217) — batched; mirrors gnark's exact branch
    structure (including its use of the w^5 block as the branch test)."""
    tf = st.tf
    b = _blocks(st, f)
    g1, g2, g3, g5 = b[2], b[4], b[1], b[5]

    g5z = tf.is_zero(g5)
    # branch A (gnark's "g3 == 0" arm, tested on C1.B2): t0 = 2 g1 g5, t1 = g2
    t0_a = tf.double(tf.mul(g1, g5))
    t1_a = g2
    # branch B: t0 = nr g5^2 + 3 g1^2 - 2 g2, t1 = 4 g3
    s0 = tf.square(g1)
    s1 = tf.add(tf.double(tf.sub(s0, g2)), s0)                # 3 g1^2 - 2 g2
    t0_b = tf.add(_mul_xi(st, tf.square(g5)), s1)
    t1_b = tf.double(tf.double(g3))

    t0 = tf.select(g5z, t0_a, t0_b)
    t1 = tf.select(g5z, t1_a, t1_b)
    g4 = tf.mul(t0, tf.inverse(t1))                           # the costly div

    # g0 = nr (2 g4^2 + g3 g5 - 3 g2 g1) + 1
    u1 = tf.mul(g2, g1)
    u2 = tf.sub(tf.double(tf.sub(tf.square(g4), u1)), u1)
    u2 = tf.add(u2, tf.mul(g3, g5))
    g0 = tf.add(_mul_xi(st, u2), tf.one(g4.shape[1:]))

    out = list(b)
    out[0], out[3] = g0, g4
    res = _from_blocks(st, out)
    # g5 == 0 and g2 == 0 -> x == 1
    both = jnp.logical_and(g5z, tf.is_zero(g2))
    return st.full.select(both, st.full.one(f.shape[1:]), res)


def batch_decompress_karabina(st, fs):
    """BatchDecompressKarabina (e12.go:287): decompress a list of compressed
    states.  Our decompression is already batched over the element batch axes
    (one Fermat inverse serves the whole array), so the list form just stacks,
    decompresses once, and unstacks."""
    if not fs:
        return fs
    stacked = jnp.stack(fs, axis=1)            # (L, k, *batch)
    out = decompress_karabina(st, stacked)
    return [out[:, i] for i in range(out.shape[1])]


# ---------------------------------------------------------------------------
# torus compression (Rubin-Silverberg)
# ---------------------------------------------------------------------------


def compress_torus(st, f):
    """CompressTorus (e12.go:742): full -> half-size (cubic) representative
    c = (C0 + 1) / C1.  Caller must ensure C1 != 0 (z not in {-1, 1})."""
    K = st.full
    cub = K.base
    c0, c1 = K.split(f)
    return cub.mul(cub.add(c0, cub.one(f.shape[1:])), cub.inverse(c1))


def decompress_torus(st, c):
    """DecompressTorus (e12.go:792): c -> (c + w) / (c - w)."""
    K = st.full
    cub = K.base
    one = cub.one(c.shape[1:])
    num = K.join([c, one])
    den = K.join([c, cub.neg(one)])
    return K.mul(K.inverse(den), num)


def batch_compress_torus(st, fs):
    """BatchCompressTorus (e12.go:758): stacked batch, one shared inverse."""
    if not fs:
        raise ValueError("invalid input size")
    stacked = jnp.stack(fs, axis=1)
    out = compress_torus(st, stacked)
    return [out[:, i] for i in range(out.shape[1])]


# ---------------------------------------------------------------------------
# GT membership
# ---------------------------------------------------------------------------


def gt_is_in_subgroup(st, f):
    """GT subgroup membership, batched -> bool mask.

    bn254 uses gnark's exact identity (e12.go:723): z^p == z^(6t^2), which
    holds iff z^r == 1 since p - 6t^2 = r for BN curves.  Other families use
    the defining check z^r == 1 with cyclotomic squares (utility path;
    r-bit exponentiation)."""
    K = st.full
    if st.family == "bn":
        a = K.frobenius(f, 1)
        b = expt(st, expt(st, f))
        b = cyclotomic_square(st, b)
        b2 = cyclotomic_square(st, b)
        b = K.mul(b, b2)
        return K.eq(a, b)
    from .cyclotomic import pow_cyc

    return K.eq(pow_cyc(st, f, st.r), K.one(f.shape[1:]))
