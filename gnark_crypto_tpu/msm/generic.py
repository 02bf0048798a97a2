"""Pippenger MSM generic over any curves/group.py Group (G1 or G2).

Same TPU-first schedule as msm/msm.py (signed digits, sort+rank scatter into a
padded bucket matrix, log-depth tree reduction, running-sum window reduce,
Horner window fold — see that module's docstring and ecc/bn254/multiexp.go);
the field is abstracted behind the flat Ops protocol so G2 MSM over Fp2/Fp4
coordinates (reference: ecc/bn254/g2.go MultiExp, ecc/bls24-315/multiexp.go)
is the same code as G1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves.group import (
    AffineF,
    Group,
    JacF,
    jac_add,
    jac_double,
    jac_inf,
)
from .msm import _ceil_pow2, default_window, pick_cap, signed_digits


def _bucket_matrix_accumulate(
    g: Group, points: AffineF, digit: jax.Array, n_buckets: int, cap: int
):
    F = g.ops
    n = digit.shape[0]
    absd = jnp.abs(digit)
    sign = digit < 0
    order = jnp.argsort(absd, stable=True)
    sorted_b = absd[order]
    counts = jnp.bincount(absd, length=n_buckets + 1)
    starts = jnp.cumsum(counts) - counts
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sorted_b].astype(jnp.int32)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    overflow = jnp.logical_and(rank >= cap, absd > 0)
    n_over = jnp.sum(overflow.astype(jnp.int32))
    dump = jnp.logical_or(overflow, absd == 0)
    eff_b = jnp.where(dump, 0, absd)
    eff_r = jnp.where(dump, 0, rank)
    slot = eff_b * cap + eff_r

    total = (n_buckets + 1) * cap
    y_signed = F.select(sign, F.neg(points.y), points.y)
    xm = jnp.zeros((F.L, total), jnp.uint32).at[:, slot].set(points.x)
    ym = jnp.zeros((F.L, total), jnp.uint32).at[:, slot].set(y_signed)
    valid = jnp.zeros((total,), bool).at[slot].set(absd > 0)

    zm = F.select(valid, F.one((total,)), F.zeros((total,)))
    acc = JacF(
        xm.reshape(F.L, n_buckets + 1, cap),
        ym.reshape(F.L, n_buckets + 1, cap),
        zm.reshape(F.L, n_buckets + 1, cap),
    )
    m = cap
    while m > 1:
        m //= 2
        lhs = JacF(acc.x[:, :, :m], acc.y[:, :, :m], acc.z[:, :, :m])
        rhs = JacF(acc.x[:, :, m:2 * m], acc.y[:, :, m:2 * m], acc.z[:, :, m:2 * m])
        acc = jac_add(g, lhs, rhs)
    buckets = JacF(acc.x[:, 1:, 0], acc.y[:, 1:, 0], acc.z[:, 1:, 0])
    return buckets, n_over


def _all_window_buckets(g, points, digits, n_buckets, cap):
    def body(over_acc, d):
        buckets, n_over = _bucket_matrix_accumulate(g, points, d, n_buckets, cap)
        return over_acc + n_over, (buckets.x, buckets.y, buckets.z)

    over, (bx, by, bz) = jax.lax.scan(body, jnp.int32(0), digits)
    return over, JacF(
        jnp.moveaxis(bx, 0, 1), jnp.moveaxis(by, 0, 1), jnp.moveaxis(bz, 0, 1)
    )


def _weighted_bucket_sums(g: Group, buckets: JacF) -> JacF:
    n_windows = buckets.x.shape[1]
    rev = jax.tree.map(lambda a: jnp.flip(jnp.moveaxis(a, 2, 0), axis=0), buckets)
    init = (jac_inf(g, (n_windows,)), jac_inf(g, (n_windows,)))

    def body(carry, b):
        running, total = carry
        running = jac_add(g, running, JacF(*b))
        total = jac_add(g, total, running)
        return (running, total), None

    (_, total), _ = jax.lax.scan(body, init, (rev.x, rev.y, rev.z))
    return total


def _horner_windows(g: Group, wsums: JacF, c: int) -> JacF:
    rev = jax.tree.map(lambda a: jnp.flip(jnp.moveaxis(a, 1, 0), axis=0), wsums)
    top = JacF(rev.x[0], rev.y[0], rev.z[0])

    def body(acc, w):
        for _ in range(c):
            acc = jac_double(g, acc)
        acc = jac_add(g, acc, JacF(*w))
        return acc, None

    acc, _ = jax.lax.scan(body, top, (rev.x[1:], rev.y[1:], rev.z[1:]))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_jit(g: Group, points: AffineF, scalars: jax.Array, c: int, cap: int):
    digits = signed_digits(g.fr.bits, c, scalars)
    n_buckets = 1 << (c - 1)
    over, buckets = _all_window_buckets(g, points, digits, n_buckets, cap)
    wsums = _weighted_bucket_sums(g, buckets)
    return _horner_windows(g, wsums, c), over


def msm(g: Group, points: AffineF, scalars: jax.Array, c: int | None = None) -> JacF:
    """MultiExp over any Group; exact via overflow retry (see msm.msm)."""
    n = points.x.shape[1]
    if c is None:
        c = default_window(n, g.fr.bits)
    cap = pick_cap(n, c)
    while True:
        result, n_over = msm_jit(g, points, scalars, c, cap)
        if int(n_over) == 0:
            return result
        cap = min(cap * 2, _ceil_pow2(n))
        if cap >= _ceil_pow2(n):
            result, n_over = msm_jit(g, points, scalars, c, _ceil_pow2(n))
            assert int(n_over) == 0
            return result
