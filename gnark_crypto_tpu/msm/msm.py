"""Pippenger multi-scalar multiplication, TPU-first formulation.

Reference: ecc/bn254/multiexp.go (partitionScalars :704, window cost model
:76-95, chunk processors :213-301, reduce :302).  The algorithm is the same
signed-digit Pippenger; the *schedule* is redesigned for a SIMD machine
(SURVEY.md §7 hard part #2):

- signed c-bit digits extracted vectorized (borrow-carry over windows);
- bucket accumulation is NOT a conflict-queue scatter loop (multiexp_affine.go)
  but a scatter into a padded (n_buckets, K) point matrix by per-bucket rank
  (rank = position - bucket_start, from a cheap int32 argsort) followed by a
  log2(K) pairwise tree reduction with complete Jacobian adds;
- the Σ b·Bucket_b weighted reduction uses a reverse associative scan
  (suffix sums) + pairwise tree fold, replacing the serial running-sum of
  msmReduceChunkG1Affine (multiexp.go:302);
- the final Σ_w 2^{cw} S_w combination is a short sequential tail inside jit.

Overflow soundness: bucket capacity K is static; points whose rank >= K are
diverted to the (ignored) bucket-0 row and *counted*.  `msm()` re-runs with
doubled K if the count is nonzero, so results are exact for any input, while
the common case stays a single fully-jitted pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import (
    Affine,
    Jac,
    jac_add,
    jac_double,
    jac_inf,
    jac_select,
)
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fields.spec import LIMB_BITS


def default_window(n: int, bits: int) -> int:
    """Window size from the reference's cost model (bits+1)*(n + 2^c)/c
    (multiexp.go:76-95), restricted to c <= 16."""
    best_c, best_cost = 4, None
    for c in range(4, 17):
        cost = (bits + 1) * (n + (1 << c)) / c
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def signed_digits(fr_bits: int, c: int, scalars: jax.Array) -> list[jax.Array]:
    """Signed c-bit windows of plain (non-Montgomery) scalar limb arrays.

    Returns n_windows int32 arrays in [-2^(c-1), 2^(c-1)] (partitionScalars,
    multiexp.go:704-856, vectorized)."""
    assert 4 <= c <= 16
    n_limbs = scalars.shape[0]
    n_windows = -(-(fr_bits + 1) // c)
    half = 1 << (c - 1)
    full = 1 << c
    mask = jnp.uint32(full - 1)
    digits = []
    carry = jnp.zeros(scalars.shape[1:], dtype=jnp.int32)
    for w in range(n_windows):
        o = w * c
        i0, sh = o // LIMB_BITS, o % LIMB_BITS
        lo = scalars[i0]
        hi = scalars[i0 + 1] if i0 + 1 < n_limbs else jnp.zeros_like(lo)
        combined = lo | (hi << LIMB_BITS)
        raw = ((combined >> jnp.uint32(sh)) & mask).astype(jnp.int32)
        d = raw + carry
        borrow = d > half
        digits.append(jnp.where(borrow, d - full, d))
        carry = borrow.astype(jnp.int32)
    return digits


def _bucket_matrix_accumulate(
    cs: CurveSpec, points: Affine, digit: jax.Array, n_buckets: int, cap: int
):
    """Scatter points into a ((n_buckets+1) * cap) padded matrix by
    (|digit|, rank) and tree-reduce columns.  Returns (Jac buckets[1..nb],
    overflow_count)."""
    f = cs.fp
    n = digit.shape[0]
    absd = jnp.abs(digit)
    sign = digit < 0
    # rank of each point within its bucket (stable): sort positions by bucket
    order = jnp.argsort(absd, stable=True)
    sorted_b = absd[order]
    counts = jnp.bincount(absd, length=n_buckets + 1)
    starts = jnp.cumsum(counts) - counts
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sorted_b].astype(jnp.int32)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    overflow = jnp.logical_and(rank >= cap, absd > 0)
    n_over = jnp.sum(overflow.astype(jnp.int32))
    # divert bucket-0 and overflow entries into the (ignored) bucket-0 row
    eff_b = jnp.where(overflow, 0, absd)
    eff_r = jnp.where(overflow, 0, rank)
    slot = eff_b * cap + eff_r  # unique per (bucket, rank) except row 0

    total = (n_buckets + 1) * cap
    y_signed = mont.select(sign, mont.neg(f, points.y), points.y)
    xm = jnp.zeros((f.n_limbs, total), jnp.uint32).at[:, slot].set(points.x)
    ym = jnp.zeros((f.n_limbs, total), jnp.uint32).at[:, slot].set(y_signed)
    valid = jnp.zeros((total,), bool).at[slot].set(absd > 0)

    zm = mont.select(valid, mont.one(f, (total,)), mont.zeros(f, (total,)))
    acc = Jac(
        xm.reshape(f.n_limbs, n_buckets + 1, cap),
        ym.reshape(f.n_limbs, n_buckets + 1, cap),
        zm.reshape(f.n_limbs, n_buckets + 1, cap),
    )
    # pairwise tree reduction along the capacity axis
    m = cap
    while m > 1:
        m //= 2
        lhs = Jac(acc.x[:, :, :m], acc.y[:, :, :m], acc.z[:, :, :m])
        rhs = Jac(acc.x[:, :, m:2 * m], acc.y[:, :, m:2 * m], acc.z[:, :, m:2 * m])
        acc = jac_add(cs, lhs, rhs)
    buckets = Jac(acc.x[:, 1:, 0], acc.y[:, 1:, 0], acc.z[:, 1:, 0])
    return buckets, n_over


def _weighted_bucket_sum(cs: CurveSpec, buckets: Jac) -> Jac:
    """Σ_{b=1..nb} b * B_b = Σ_b suffix_b via reverse associative scan +
    pairwise fold (parallel form of multiexp.go:302 running sum)."""
    suffix = jax.lax.associative_scan(
        lambda u, v: jac_add(cs, u, v), buckets, axis=1, reverse=True
    )
    nb = suffix.x.shape[1]
    acc = suffix
    m = nb
    while m > 1:
        h = m // 2
        lhs = Jac(acc.x[:, :h], acc.y[:, :h], acc.z[:, :h])
        rhs = Jac(acc.x[:, h:2 * h], acc.y[:, h:2 * h], acc.z[:, h:2 * h])
        merged = jac_add(cs, lhs, rhs)
        if m % 2:  # odd leftover element
            last = Jac(acc.x[:, -1:], acc.y[:, -1:], acc.z[:, -1:])
            first = Jac(merged.x[:, :1], merged.y[:, :1], merged.z[:, :1])
            folded = jac_add(cs, first, last)
            merged = Jac(
                jnp.concatenate([folded.x, merged.x[:, 1:]], 1),
                jnp.concatenate([folded.y, merged.y[:, 1:]], 1),
                jnp.concatenate([folded.z, merged.z[:, 1:]], 1),
            )
        acc = merged
        m = h
    return Jac(acc.x[:, 0], acc.y[:, 0], acc.z[:, 0])


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_jit(cs: CurveSpec, points: Affine, scalars: jax.Array, c: int, cap: int):
    """One fully-jitted MSM pass.  Returns (Jac result, total_overflow)."""
    fr_bits = cs.fr.bits
    digits = signed_digits(fr_bits, c, scalars)
    n_buckets = 1 << (c - 1)
    window_sums = []
    n_over_total = jnp.int32(0)
    for d in digits:
        buckets, n_over = _bucket_matrix_accumulate(cs, points, d, n_buckets, cap)
        window_sums.append(_weighted_bucket_sum(cs, buckets))
        n_over_total = n_over_total + n_over
    # result = Σ_w 2^{cw} S_w, Horner from the top window
    acc = window_sums[-1]
    for w in range(len(window_sums) - 2, -1, -1):
        for _ in range(c):
            acc = jac_double(cs, acc)
        acc = jac_add(cs, acc, window_sums[w])
    return acc, n_over_total


def msm(cs: CurveSpec, points: Affine, scalars: jax.Array, c: int | None = None) -> Jac:
    """MultiExp (multiexp.go:20 public API).  points: Affine SoA (n_limbs, N);
    scalars: plain fr limb array (n_limbs, N).  Exact for any input via
    overflow retry with doubled bucket capacity."""
    n = points.x.shape[1]
    if c is None:
        c = default_window(n, cs.fr.bits)
    n_buckets = 1 << (c - 1)
    mean = max(1, -(-n // n_buckets))
    cap = 1 << max(1, (2 * mean - 1).bit_length())  # >= 2x mean load, pow2
    while True:
        result, n_over = msm_jit(cs, points, scalars, c, min(cap, _ceil_pow2(n)))
        if int(n_over) == 0:
            return result
        cap *= 2
        if cap > 2 * n:
            # degenerate: everything in one bucket; cap at n (always sufficient)
            result, n_over = msm_jit(cs, points, scalars, c, _ceil_pow2(n))
            assert int(n_over) == 0
            return result


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())
