"""Pippenger multi-scalar multiplication, TPU-first formulation.

Reference: ecc/bn254/multiexp.go (partitionScalars :704, window cost model
:76-95, chunk processors :213-301, reduce :302).  The algorithm is the same
signed-digit Pippenger; the *schedule* is redesigned for a SIMD machine
(SURVEY.md §7 hard part #2):

- signed c-bit digits extracted vectorized (borrow-carry over windows);
- bucket accumulation is NOT a conflict-queue scatter loop (multiexp_affine.go)
  but a scatter into a padded (n_buckets, cap) point matrix by per-bucket rank
  (rank = position - bucket_start, from a cheap int32 argsort) followed by a
  log2(cap) pairwise tree reduction with complete Jacobian adds;
- windows are processed under ONE lax.scan (uniform computation, one compiled
  body) instead of the reference's chunk goroutines;
- the Σ b·Bucket_b reduction is the classic two-accumulator running sum
  (msmReduceChunkG1Affine, multiexp.go:302) as a scan over buckets, batched
  across all windows at once;
- the final Σ_w 2^{cw} S_w Horner combination is a scan over windows.

Overflow soundness: bucket capacity `cap` is static; points whose rank >= cap
are diverted to the (ignored) bucket-0 row and *counted*.  `msm()` re-runs
with doubled cap if the count is nonzero, so results are exact for any input,
while the common case stays a single fully-jitted pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import Affine, Jac, jac_add, jac_double, jac_inf, jac_select
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


def signed_digits(fr_bits: int, c: int, scalars: jax.Array) -> jax.Array:
    """Signed c-bit windows of plain (non-Montgomery) scalar limb arrays.

    Returns (n_windows, N) int32 in [-2^(c-1), 2^(c-1)] (partitionScalars,
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
    return jnp.stack(digits, axis=0)


def _affine_pair_add(cs: CurveSpec, x1, y1, v1, x2, y2, v2) -> Jac:
    """Complete add of two affine-with-validity points -> Jacobian.

    mmadd-2007-bl (both Z=1, 4M+2S) + mdbl-2007-bl doubling case (1M+5S) +
    validity/infinity selects.  Used for the first level of the bucket tree
    reduction, where every slot is still an input point: ~2.2x cheaper than
    the complete jac_add (11M+5S plus an embedded jac_double)."""
    f = cs.fp
    h = mont.sub(f, x2, x1)
    hh = mont.square(f, h)
    i = mont.double(f, mont.double(f, hh))
    j = mont.mul(f, h, i)
    r = mont.double(f, mont.sub(f, y2, y1))
    v = mont.mul(f, x1, i)
    x3 = mont.sub(f, mont.sub(f, mont.square(f, r), j), mont.double(f, v))
    y3 = mont.sub(
        f,
        mont.mul(f, r, mont.sub(f, v, x3)),
        mont.double(f, mont.mul(f, y1, j)),
    )
    z3 = mont.double(f, h)
    out = Jac(x3, y3, z3)

    # doubling case (mdbl-2007-bl, Z=1)
    xx = mont.square(f, x1)
    yy = mont.square(f, y1)
    yyyy = mont.square(f, yy)
    s = mont.double(
        f, mont.sub(f, mont.sub(f, mont.square(f, mont.add(f, x1, yy)), xx), yyyy)
    )
    m = mont.add(f, mont.double(f, xx), xx)
    if cs.a != 0:
        m = mont.add(f, m, mont.const(f, cs.a, x1.shape[1:]))
    t = mont.sub(f, mont.square(f, m), mont.double(f, s))
    y3d = mont.sub(
        f,
        mont.mul(f, m, mont.sub(f, s, t)),
        mont.double(f, mont.double(f, mont.double(f, yyyy))),
    )
    dbl = Jac(t, y3d, mont.double(f, y1))

    hz = mont.is_zero(f, h)
    yeq = mont.eq(f, y1, y2)
    both = jnp.logical_and(v1, v2)
    out = jac_select(jnp.logical_and(hz, yeq), dbl, out)
    out = jac_select(
        jnp.logical_and(hz, jnp.logical_not(yeq)), jac_inf(cs, x1.shape[1:]), out
    )
    one_ = mont.one(f, x1.shape[1:])
    zero_ = mont.zeros(f, x1.shape[1:])
    only1 = jnp.logical_and(v1, jnp.logical_not(v2))
    only2 = jnp.logical_and(v2, jnp.logical_not(v1))
    out = jac_select(jnp.logical_not(both), jac_inf(cs, x1.shape[1:]), out)
    out = jac_select(only1, Jac(x1, y1, one_), out)
    out = jac_select(only2, Jac(x2, y2, one_), out)
    del zero_
    return out


def _bucket_matrix_accumulate(
    cs: CurveSpec, points: Affine, digit: jax.Array, n_buckets: int, cap: int
):
    """Scatter points into a ((n_buckets+1) * cap) padded matrix by
    (|digit|, rank) and tree-reduce the cap axis.  Returns (Jac buckets with
    batch (n_buckets,), overflow_count)."""
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
    # divert bucket-0 and overflow entries into slot 0 of the (ignored)
    # bucket-0 row; bucket-0 ranks are NOT capped by `cap`, so they must be
    # zeroed or they would spill into real bucket rows
    dump = jnp.logical_or(overflow, absd == 0)
    eff_b = jnp.where(dump, 0, absd)
    eff_r = jnp.where(dump, 0, rank)
    slot = eff_b * cap + eff_r  # unique per (bucket, rank) except row 0

    total = (n_buckets + 1) * cap
    y_signed = mont.select(sign, mont.neg(f, points.y), points.y)
    xm = jnp.zeros((f.n_limbs, total), jnp.uint32).at[:, slot].set(points.x)
    ym = jnp.zeros((f.n_limbs, total), jnp.uint32).at[:, slot].set(y_signed)
    valid = jnp.zeros((total,), bool).at[slot].set(absd > 0)

    xm = xm.reshape(f.n_limbs, n_buckets + 1, cap)
    ym = ym.reshape(f.n_limbs, n_buckets + 1, cap)
    vm = valid.reshape(n_buckets + 1, cap)
    # level 1: every slot is an input point (affine, Z=1) — cheap pair add
    if cap > 1:
        m = cap // 2
        acc = _affine_pair_add(
            cs,
            xm[:, :, :m], ym[:, :, :m], vm[:, :m],
            xm[:, :, m:], ym[:, :, m:], vm[:, m:],
        )
    else:
        zm = mont.select(vm, mont.one(f, vm.shape), mont.zeros(f, vm.shape))
        acc, m = Jac(xm, ym, zm), 1
    # remaining levels: complete Jacobian pairwise tree (log2(cap)-1 adds)
    while m > 1:
        m //= 2
        lhs = Jac(acc.x[:, :, :m], acc.y[:, :, :m], acc.z[:, :, :m])
        rhs = Jac(acc.x[:, :, m:2 * m], acc.y[:, :, m:2 * m], acc.z[:, :, m:2 * m])
        acc = jac_add(cs, lhs, rhs)
    buckets = Jac(acc.x[:, 1:, 0], acc.y[:, 1:, 0], acc.z[:, 1:, 0])
    return buckets, n_over


def _small_window_sum(cs: CurveSpec, points: Affine, digit: jax.Array,
                      m_bits: int) -> Jac:
    """Σ dᵢ·Pᵢ for small non-negative digits d ∈ [0, 2^m_bits].

    The TOP Pippenger window of a b-bit scalar has only b mod c live bits
    (the reference's lastC handling, multiexp.go:681-693); its buckets are
    ~2^(c-1-m) times overloaded, which would blow any bucket capacity sized
    for the uniform windows (this was the round-1 bench failure).  Instead of
    bucket scatter, decompose over bit planes:

        Σᵢ dᵢ·Pᵢ = Σ_j 2^j · (Σ_{i: bit j of dᵢ} Pᵢ)

    — each inner sum a validity-masked pairwise tree (affine first level,
    complete Jacobian above), all planes batched in one pass."""
    f = cs.fp
    n = digit.shape[0]
    nb = m_bits + 1  # d can equal 2^m_bits (carry in), needing bit m_bits
    np2 = max(2, _ceil_pow2(n))
    bits = jax.lax.broadcasted_iota(jnp.int32, (nb, n), 0)
    masks = ((digit[None, :] >> bits) & 1) == 1  # (nb, n)
    x = jnp.broadcast_to(points.x[:, None, :], (f.n_limbs, nb, n))
    y = jnp.broadcast_to(points.y[:, None, :], (f.n_limbs, nb, n))
    if np2 != n:
        pad = np2 - n
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
        masks = jnp.pad(masks, ((0, 0), (0, pad)))
    m = np2 // 2
    acc = _affine_pair_add(
        cs,
        x[:, :, :m], y[:, :, :m], masks[:, :m],
        x[:, :, m:], y[:, :, m:], masks[:, m:],
    )
    while m > 1:
        m //= 2
        acc = jac_add(
            cs,
            Jac(acc.x[:, :, :m], acc.y[:, :, :m], acc.z[:, :, :m]),
            Jac(acc.x[:, :, m:2 * m], acc.y[:, :, m:2 * m], acc.z[:, :, m:2 * m]),
        )
    planes = Jac(acc.x[:, :, 0], acc.y[:, :, 0], acc.z[:, :, 0])  # batch (nb,)
    out = Jac(planes.x[:, nb - 1], planes.y[:, nb - 1], planes.z[:, nb - 1])
    for j in range(nb - 2, -1, -1):
        out = jac_double(cs, out)
        out = jac_add(cs, out, Jac(planes.x[:, j], planes.y[:, j], planes.z[:, j]))
    return out


def _all_window_buckets(cs, points, digits, n_buckets, cap):
    """lax.scan over windows -> stacked buckets (W, n_limbs, nb) x 3."""

    def body(over_acc, d):
        buckets, n_over = _bucket_matrix_accumulate(cs, points, d, n_buckets, cap)
        return over_acc + n_over, (buckets.x, buckets.y, buckets.z)

    over, (bx, by, bz) = jax.lax.scan(body, jnp.int32(0), digits)
    return over, Jac(
        jnp.moveaxis(bx, 0, 1), jnp.moveaxis(by, 0, 1), jnp.moveaxis(bz, 0, 1)
    )  # (n_limbs, W, nb)


def _jac_sum_axis(cs: CurveSpec, p: Jac, axis: int) -> Jac:
    """Pairwise tree fold of Jacobian points along one batch axis."""
    m = p.x.shape[axis]

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    while m > 1:
        h = m // 2
        merged = jac_add(
            cs,
            Jac(*(take(a, slice(0, h)) for a in p)),
            Jac(*(take(a, slice(h, 2 * h)) for a in p)),
        )
        if m % 2:
            merged = Jac(*(
                jnp.concatenate([ma, take(a, slice(m - 1, m))], axis=axis)
                for ma, a in zip(merged, p)
            ))
            m = h + 1
        else:
            m = h
        p = merged
    return Jac(*(jnp.squeeze(take(a, slice(0, 1)), axis=axis) for a in p))


def _weighted_bucket_sums(cs: CurveSpec, buckets: Jac, block: int = 128) -> Jac:
    """Σ_{b=1..nb} b * B_b for every window at once.

    The classic two-accumulator running sum (msmReduceChunkG1Affine,
    multiexp.go:302) is depth-nb serial; here it is BLOCKED: split the bucket
    axis into J chunks of G buckets and run the running sum inside all chunks
    in parallel (depth G, width W*J), giving per chunk j

        S_j = Σ_{i=1..G} i * B_{base_j + i},   C_j = Σ_i B_{base_j + i}

    with base_m = m*G (chunk m = reshape group m, covering buckets
    mG+1..mG+G), so  Σ_b b*B_b = Σ_m S_m + G * Σ_m m*C_m.  The cross-chunk
    weighted sum reuses the same two-accumulator trick over J chunks (fed
    highest-m first), and the factor G is log2(G) doublings.  Depth
    ~G+J+log2(G*J) instead of nb; compute unchanged (2 adds per bucket)."""
    n_limbs, n_windows, nb = buckets.x.shape
    G = min(block, nb)
    assert nb % G == 0
    J = nb // G
    # within-chunk scan order: highest bucket of the chunk first, so that
    # B_{mG+i} accumulates coefficient i in the running total
    resh = jax.tree.map(
        lambda a: jnp.flip(a.reshape(n_limbs, n_windows, J, G), axis=3), buckets
    )  # [..., m, s] = B_{mG + G - s}
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, 3, 0), resh)  # (G, nl, W, J)
    init = (jac_inf(cs, (n_windows, J)), jac_inf(cs, (n_windows, J)))

    def body(carry, b):
        running, total = carry
        running = jac_add(cs, running, Jac(*b))
        total = jac_add(cs, total, running)
        return (running, total), None

    (c_chunks, s_chunks), _ = jax.lax.scan(body, init, tuple(xs))
    # cross-chunk: T = Σ_m m * C_m; feeding m = J-1 .. 0 into the
    # add-after-accumulate loop gives C_m exactly coefficient m
    cxs = jax.tree.map(
        lambda a: jnp.flip(jnp.moveaxis(a, 2, 0), axis=0), c_chunks
    )  # (J, nl, W), highest chunk first
    init2 = (jac_inf(cs, (n_windows,)), jac_inf(cs, (n_windows,)))

    def body2(carry, c):
        running, total = carry
        total = jac_add(cs, total, running)
        running = jac_add(cs, running, Jac(*c))
        return (running, total), None

    (_, t), _ = jax.lax.scan(body2, init2, tuple(cxs))
    for _ in range(G.bit_length() - 1):  # T *= G (G a power of two)
        t = jac_double(cs, t)
    s_total = _jac_sum_axis(cs, s_chunks, axis=2)  # Σ_j S_j, (nl, W)
    return jac_add(cs, s_total, t)


def _horner_windows(cs: CurveSpec, wsums: Jac, c: int) -> Jac:
    """Σ_w 2^{cw} S_w via Horner from the top window (scan)."""
    n_windows = wsums.x.shape[1]
    rev = jax.tree.map(lambda a: jnp.flip(jnp.moveaxis(a, 1, 0), axis=0), wsums)
    top = Jac(rev.x[0], rev.y[0], rev.z[0])

    def body(acc, w):
        wx, wy, wz = w
        for _ in range(c):
            acc = jac_double(cs, acc)
        acc = jac_add(cs, acc, Jac(wx, wy, wz))
        return acc, None

    acc, _ = jax.lax.scan(body, top, (rev.x[1:], rev.y[1:], rev.z[1:]))
    return acc


def window_sums(cs: CurveSpec, points: Affine, scalars: jax.Array,
                c: int, cap: int):
    """All per-window sums S_w (including the skewed top window).

    Returns (overflow_count, Jac wsums with batch (n_windows,)).  The top
    window of a b-bit scalar has only b mod c live bits (lastC,
    multiexp.go:681-693); when it spans at most a quarter of the buckets it
    is routed through the bit-plane path (_small_window_sum) instead of the
    bucket matrix — its bucket loads are 2^(c-1-m) x the uniform windows',
    which would force the shared static capacity sky-high (the round-1
    failure mode: cap-doubling retry storm)."""
    digits = signed_digits(cs.fr.bits, c, scalars)
    n_buckets = 1 << (c - 1)
    n_windows = digits.shape[0]
    m_bits = cs.fr.bits - c * (n_windows - 1)
    split_top = n_windows > 1 and m_bits <= c - 2
    scan_digits = digits[:-1] if split_top else digits
    over, buckets = _all_window_buckets(cs, points, scan_digits, n_buckets, cap)
    wsums = _weighted_bucket_sums(cs, buckets)
    if split_top:
        top = _small_window_sum(cs, points, digits[-1], m_bits)
        wsums = Jac(
            jnp.concatenate([wsums.x, top.x[:, None]], axis=1),
            jnp.concatenate([wsums.y, top.y[:, None]], axis=1),
            jnp.concatenate([wsums.z, top.z[:, None]], axis=1),
        )
    return over, wsums


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_jit(cs: CurveSpec, points: Affine, scalars: jax.Array, c: int, cap: int):
    """One fully-jitted MSM pass.  Returns (Jac result, total_overflow)."""
    over, wsums = window_sums(cs, points, scalars, c, cap)
    return _horner_windows(cs, wsums, c), over


def pick_cap(n: int, c: int) -> int:
    """Bucket capacity: >= 4x the mean load and >= 16.  At 4x the mean the
    per-bucket overflow probability is a Chernoff tail exp(-mean*(4ln4-3))
    ~ exp(-2.5*mean); summed over all (window, bucket) cells this is
    negligible for mean >= 8, so the single-pass jitted MSM almost never
    retries (2x was NOT enough: at n=2^18, c=14 the retry rate was ~50%)."""
    n_buckets = 1 << (c - 1)
    mean = max(1, -(-n // n_buckets))
    cap = 1 << max(4, (4 * mean - 1).bit_length())
    return min(cap, _ceil_pow2(n))


def msm(cs: CurveSpec, points: Affine, scalars: jax.Array, c: int | None = None) -> Jac:
    """MultiExp (multiexp.go:20 public API).  points: Affine SoA (n_limbs, N);
    scalars: plain fr limb array (n_limbs, N).  Exact for any input via
    overflow retry with doubled bucket capacity."""
    n = points.x.shape[1]
    if c is None:
        c = default_window(n, cs.fr.bits)
    cap = pick_cap(n, c)
    while True:
        result, n_over = msm_jit(cs, points, scalars, c, cap)
        if int(n_over) == 0:
            return result
        cap = min(cap * 2, _ceil_pow2(n))
        if cap >= _ceil_pow2(n):
            result, n_over = msm_jit(cs, points, scalars, c, _ceil_pow2(n))
            assert int(n_over) == 0
            return result


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())
