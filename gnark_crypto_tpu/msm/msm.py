"""Pippenger multi-scalar multiplication, TPU-first formulation.

Reference: ecc/bn254/multiexp.go (partitionScalars :704, window cost model
:76-95, chunk processors :213-301, reduce :302).  The algorithm is the same
signed-digit Pippenger; the *schedule* is redesigned for a SIMD machine
(SURVEY.md §7 hard part #2):

- signed c-bit digits extracted vectorized (borrow-carry over windows);
- bucket accumulation is LOAD-ROBUST for any digit distribution: per window,
  points are argsorted by |digit| and the sorted run is segment-reduced with a
  log-depth SEGMENTED SCAN (Blelloch-style even/odd recursion with a
  "segment-start" flag).  There is no per-bucket capacity, no padded bucket
  matrix, and no data-dependent retry — the cost is ~2 point-adds per point
  per window regardless of skew (all-equal scalars included), where the
  reference's conflict-queue batch-affine processor (multiexp_affine.go:25)
  handles skew with control flow that has no SIMD analogue;
- windows are processed under ONE lax.scan (uniform computation, one compiled
  body) instead of the reference's chunk goroutines; within a window the
  sorted run is processed in fixed-size chunks under a second lax.scan with a
  carried boundary partial sum, bounding peak memory at ~chunk-size Jacobians;
- the Σ b·Bucket_b reduction is the classic two-accumulator running sum
  (msmReduceChunkG1Affine, multiexp.go:302) as a scan over buckets, BLOCKED
  across bucket groups and batched across all windows at once;
- the final Σ_w 2^{cw} S_w Horner combination is a scan over windows.

The same core runs G1 (16-limb Fp coordinates) and any generic curves/group.py
Group (G2 over Fp2/Fp4 flat limb stacks) through the _PointOps adapter.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import Affine, Jac, jac_add, jac_double, jac_inf, jac_select
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fields.spec import LIMB_BITS

# chunk size for the within-window segmented scan: bounds peak memory at
# ~3 * L * CHUNK uint32 live Jacobian limbs (plus the gathered window).
DEFAULT_CHUNK = 1 << 21


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
    multiexp.go:704-856, vectorized).  c <= 17 keeps every window inside the
    32-bit two-limb read below (sh <= 15, so sh + c <= 32)."""
    assert 4 <= c <= 17
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


class _PointOps(NamedTuple):
    """Adapter making the MSM core generic over the coordinate field.

    Points are NamedTuples of (L, *batch) uint32 arrays (Jac: x,y,z)."""

    L: int
    jac: Any                              # Jac-like constructor (x, y, z)
    add: Callable                         # complete jac add
    double: Callable
    inf: Callable                         # jac_inf(batch_shape)
    select: Callable                      # jac_select(mask, a, b)
    fneg: Callable                        # field negate
    fselect: Callable                     # field select(mask, a, b)
    fone: Callable                        # field one(batch_shape)
    fzeros: Callable                      # field zeros(batch_shape)


def _ops_for_curve(cs: CurveSpec) -> _PointOps:
    f = cs.fp
    return _PointOps(
        L=f.n_limbs,
        jac=Jac,
        add=lambda p, q: jac_add(cs, p, q),
        double=lambda p: jac_double(cs, p),
        inf=lambda batch: jac_inf(cs, batch),
        select=jac_select,
        fneg=lambda a: mont.neg(f, a),
        fselect=mont.select,
        fone=lambda batch: mont.one(f, batch),
        fzeros=lambda batch: mont.zeros(f, batch),
    )


def _take_last(tree, sl):
    return jax.tree.map(lambda a: a[..., sl], tree)


def _interleave_last(a, b):
    """Zip two (..., m) trees into (..., 2m) along the last axis."""
    def leaf(x, y):
        stacked = jnp.stack([x, y], axis=-1)
        return stacked.reshape(x.shape[:-1] + (2 * x.shape[-1],))
    return jax.tree.map(leaf, a, b)


def _segscan(op, f: jax.Array, p):
    """Inclusive segmented scan along the LAST axis (power-of-two length).

    f: (..., n) bool, True where element starts a new segment; p: point tree
    with matching last axis.  op(((fa, pa), (fb, pb))) -> (f, p) is the
    standard segmented-scan combiner.  Even/odd (Blelloch) recursion:
    ~2 combines per element, log2(n) depth."""
    n = f.shape[-1]
    if n == 1:
        return f, p
    ev = (f[..., 0::2], _take_last(p, slice(0, None, 2)))
    od = (f[..., 1::2], _take_last(p, slice(1, None, 2)))
    cf, cp = op(ev, od)
    sf, sp = _segscan(op, cf, cp)          # inclusive scan at odd positions
    if n > 2:
        pf, pp = op(
            (sf[..., :-1], _take_last(sp, slice(0, -1))),
            (f[..., 2::2], _take_last(p, slice(2, None, 2))),
        )
        ef = jnp.concatenate([f[..., :1], pf], axis=-1)
        ep = jax.tree.map(
            lambda a, b: jnp.concatenate([a[..., :1], b], axis=-1), p, pp
        )
    else:
        ef = f[..., :1]
        ep = _take_last(p, slice(0, 1))
    return _interleave_last(ef, sf), _interleave_last(ep, sp)


def _seg_op(ops: _PointOps):
    def op(l, r):
        fl, pl = l
        fr_, pr = r
        s = ops.add(pl, pr)
        return jnp.logical_or(fl, fr_), ops.select(fr_, pr, s)
    return op


def _window_bucket_sums(
    ops: _PointOps, points, digit: jax.Array, n_buckets: int, chunk: int
):
    """Exact per-bucket sums for one window — any digit distribution.

    digit: (n,) int32 in [-n_buckets, n_buckets].  Returns Jac-tree with batch
    (n_buckets,) = [Σ points with |digit| == b] for b = 1..n_buckets (bucket
    b empty -> infinity).  n must be a power of two (callers pad)."""
    n = digit.shape[0]
    chunk = min(chunk, n)
    assert n & (n - 1) == 0, f"bucket accumulation needs power-of-two n, got {n}"
    assert n % chunk == 0, (
        f"n={n} not a multiple of chunk={chunk}: the scan would silently "
        f"drop the tail (pad with zero scalars first)"
    )
    K = n // chunk
    absd = jnp.abs(digit)
    sign = digit < 0

    order = jnp.argsort(absd)
    sorted_b = absd[order]
    # segment starts / per-bucket end positions in the sorted run
    flags = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_b[1:] != sorted_b[:-1]]
    )
    counts = jnp.bincount(absd, length=n_buckets + 1)
    ends = jnp.cumsum(counts) - 1          # end index of bucket b (if nonempty)

    xs = points.x[:, order]
    y_signed = ops.fselect(sign, ops.fneg(points.y), points.y)
    ys = y_signed[:, order]
    valid = sorted_b > 0

    op = _seg_op(ops)

    # NB the chunk loop slices (L, n) arrays and writes an (L, n) output via
    # dynamic-update-slice instead of lax.scan input/output stacking: the
    # stacked (K, L, chunk) form makes XLA put the small L axis in the
    # 128-lane tile slot (8x HBM padding — an OOM at 2^24, 28G for 6G of
    # temps).  Lanes stay on the large trailing axis throughout.
    def body(carry, i):
        carry_p, out = carry
        start = i * chunk
        x_c = jax.lax.dynamic_slice_in_dim(xs, start, chunk, axis=1)
        y_c = jax.lax.dynamic_slice_in_dim(ys, start, chunk, axis=1)
        f_c = jax.lax.dynamic_slice_in_dim(flags, start, chunk, axis=0)
        v_c = jax.lax.dynamic_slice_in_dim(valid, start, chunk, axis=0)
        # z = 1 for live points, 0 (infinity) for digit-0 entries
        z_c = ops.fselect(v_c, ops.fone(v_c.shape), ops.fzeros(v_c.shape))
        p_c = ops.jac(x_c, y_c, z_c)
        # merge the carried partial sum into element 0 when its segment
        # continues from the previous chunk; then element 0 always "starts"
        head0 = _take_last(p_c, slice(0, 1))
        merged0 = ops.add(carry_p, head0)
        cont = jnp.logical_not(f_c[:1])
        head = ops.select(cont, merged0, head0)
        p_c = jax.tree.map(
            lambda h, rest: jnp.concatenate([h, rest[..., 1:]], axis=-1),
            head, p_c,
        )
        f_local = jnp.concatenate([jnp.ones((1,), bool), f_c[1:]])
        _, scan_p = _segscan(op, f_local, p_c)
        new_carry = _take_last(scan_p, slice(-1, None))
        out = jax.tree.map(
            lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
                buf, v, start, axis=1),
            out, scan_p,
        )
        return (new_carry, out), None

    carry0 = ops.inf((1,))
    out0 = ops.jac(*(jnp.zeros((ops.L, n), jnp.uint32) for _ in range(3)))
    (_, full), _ = jax.lax.scan(
        body, (carry0, out0), jnp.arange(K, dtype=jnp.int32))
    # bucket b's sum sits at sorted position ends[b] (when counts[b] > 0)
    e = jnp.clip(ends[1:], 0, n - 1)
    sums = _take_last(full, e)             # (L, n_buckets)
    empty = counts[1:] == 0
    return ops.select(empty, ops.inf((n_buckets,)), sums)


def _all_window_buckets(ops: _PointOps, points, digits, n_buckets, chunk):
    """Loop over windows -> buckets (L, W, nb) Jac tree.

    Output accumulates via dynamic-update-slice into an (L, W, nb) buffer
    (lanes on nb) rather than lax.scan ys-stacking, for the same layout
    reason as _window_bucket_sums' chunk loop."""
    W = digits.shape[0]

    def body(carry, i):
        out = carry
        d = jax.lax.dynamic_index_in_dim(digits, i, axis=0, keepdims=False)
        buckets = _window_bucket_sums(ops, points, d, n_buckets, chunk)
        out = jax.tree.map(
            lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
                buf, v[:, None, :], i, axis=1),
            out, buckets,
        )
        return out, None

    out0 = ops.jac(*(
        jnp.zeros((ops.L, W, n_buckets), jnp.uint32) for _ in range(3)
    ))
    out, _ = jax.lax.scan(body, out0, jnp.arange(W, dtype=jnp.int32))
    return out  # (L, W, nb)


def _jac_sum_axis(ops: _PointOps, p, axis: int):
    """Pairwise tree fold of Jacobian points along one batch axis."""
    m = jax.tree.leaves(p)[0].shape[axis]

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    while m > 1:
        h = m // 2
        merged = ops.add(
            ops.jac(*(take(a, slice(0, h)) for a in p)),
            ops.jac(*(take(a, slice(h, 2 * h)) for a in p)),
        )
        if m % 2:
            merged = ops.jac(*(
                jnp.concatenate([ma, take(a, slice(m - 1, m))], axis=axis)
                for ma, a in zip(merged, p)
            ))
            m = h + 1
        else:
            m = h
        p = merged
    return ops.jac(*(jnp.squeeze(take(a, slice(0, 1)), axis=axis) for a in p))


def _weighted_bucket_sums(ops: _PointOps, buckets, block: int = 128):
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
    L, n_windows, nb = jax.tree.leaves(buckets)[0].shape
    G = min(block, nb)
    assert nb % G == 0
    J = nb // G
    # within-chunk scan order: highest bucket of the chunk first, so that
    # B_{mG+i} accumulates coefficient i in the running total
    resh = jax.tree.map(
        lambda a: jnp.flip(a.reshape(L, n_windows, J, G), axis=3), buckets
    )  # [..., m, s] = B_{mG + G - s}; lanes stay on the trailing axes
    init = (ops.inf((n_windows, J)), ops.inf((n_windows, J)))

    def body(carry, i):
        running, total = carry
        b = ops.jac(*(
            jax.lax.dynamic_index_in_dim(a, i, axis=3, keepdims=False)
            for a in resh
        ))
        running = ops.add(running, b)
        total = ops.add(total, running)
        return (running, total), None

    (c_chunks, s_chunks), _ = jax.lax.scan(
        body, init, jnp.arange(G, dtype=jnp.int32))
    # cross-chunk: T = Σ_m m * C_m; feeding m = J-1 .. 0 into the
    # add-after-accumulate loop gives C_m exactly coefficient m
    cxs = jax.tree.map(lambda a: jnp.flip(a, axis=2), c_chunks)  # (L, W, J)
    init2 = (ops.inf((n_windows,)), ops.inf((n_windows,)))

    def body2(carry, i):
        running, total = carry
        c = ops.jac(*(
            jax.lax.dynamic_index_in_dim(a, i, axis=2, keepdims=False)
            for a in cxs
        ))
        total = ops.add(total, running)
        running = ops.add(running, c)
        return (running, total), None

    (_, t), _ = jax.lax.scan(body2, init2, jnp.arange(J, dtype=jnp.int32))
    for _ in range(G.bit_length() - 1):  # T *= G (G a power of two)
        t = ops.double(t)
    s_total = _jac_sum_axis(ops, s_chunks, axis=2)  # Σ_j S_j, (L, W)
    return ops.add(s_total, t)


def _horner_windows(ops: _PointOps, wsums, c: int):
    """Σ_w 2^{cw} S_w via Horner from the top window (scan)."""
    rev = jax.tree.map(lambda a: jnp.flip(jnp.moveaxis(a, 1, 0), axis=0), wsums)
    top = ops.jac(*(a[0] for a in rev))

    def body(acc, w):
        for _ in range(c):
            acc = ops.double(acc)
        acc = ops.add(acc, ops.jac(*w))
        return acc, None

    acc, _ = jax.lax.scan(body, top, tuple(a[1:] for a in rev))
    return acc


def _msm_core(ops: _PointOps, fr_bits: int, points, scalars: jax.Array,
              c: int, chunk: int):
    digits = signed_digits(fr_bits, c, scalars)
    n_buckets = 1 << (c - 1)
    buckets = _all_window_buckets(ops, points, digits, n_buckets, chunk)
    wsums = _weighted_bucket_sums(ops, buckets)
    return _horner_windows(ops, wsums, c)


def window_sums(cs: CurveSpec, points: Affine, scalars: jax.Array,
                c: int, chunk: int = DEFAULT_CHUNK) -> Jac:
    """All per-window sums S_w as a Jac with batch (n_windows,).

    Exact for any scalar distribution (see _window_bucket_sums)."""
    points, scalars, _ = _pad_pow2(points, scalars)
    points = Affine(*points)
    ops = _ops_for_curve(cs)
    digits = signed_digits(cs.fr.bits, c, scalars)
    n_buckets = 1 << (c - 1)
    buckets = _all_window_buckets(ops, points, digits, n_buckets, chunk)
    return _weighted_bucket_sums(ops, buckets)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_jit(cs: CurveSpec, points: Affine, scalars: jax.Array, c: int,
            chunk: int = DEFAULT_CHUNK) -> Jac:
    """One fully-jitted MSM pass (exact, no retry; n a power of two)."""
    ops = _ops_for_curve(cs)
    return _msm_core(ops, cs.fr.bits, points, scalars, c, chunk)


def _pad_pow2(points, scalars):
    """Pad the batch to a power of two with zero scalars (no-op points)."""
    n = jax.tree.leaves(points)[0].shape[-1]
    np2 = _ceil_pow2(max(n, 2))
    if np2 == n:
        return points, scalars, n
    pad = np2 - n
    points = jax.tree.map(lambda a: jnp.pad(a, ((0, 0), (0, pad))), points)
    scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
    return points, scalars, n


def msm(cs: CurveSpec, points: Affine, scalars: jax.Array,
        c: int | None = None, chunk: int = DEFAULT_CHUNK) -> Jac:
    """MultiExp (multiexp.go:20 public API).  points: Affine SoA (n_limbs, N);
    scalars: plain fr limb array (n_limbs, N).  Exact for any input — the
    segmented-scan bucket accumulation has no capacity to overflow."""
    n = points.x.shape[1]
    if c is None:
        c = default_window(n, cs.fr.bits)
    points, scalars, _ = _pad_pow2(points, scalars)
    return msm_jit(cs, Affine(*points), scalars, c, chunk)


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())
