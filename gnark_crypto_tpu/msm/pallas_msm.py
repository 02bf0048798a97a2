"""Rounds-based Pippenger bucket accumulation with a fused Pallas kernel.

The TPU realization of the reference's per-chunk bucket processors
(multiexp_affine.go:18 batch-affine / multiexp_jacobian.go jacExtended): after
grouping each window's points by |digit|, bucket b's points occupy a
contiguous run [starts[b], starts[b]+counts[b]).  Round r takes the r-th
element of every run — AT MOST ONE POINT PER BUCKET, so a round is one
conflict-free batched mixed addition into per-bucket accumulators (exactly
the conflict-free batch the reference builds with its queue, ia.cr/2022/1396
§5.3, but derived from the sorted layout instead of control flow).

Round-5 data-movement redesign (measured on v5e: XLA gather streams at only
~3 GB/s — a per-index wall — while XLA sort moves each operand array at full
vector speed):

  1. the per-window grouping is a PAYLOAD-CARRYING unstable sort: the key is
     |digit| and the 2*ceil(n16/2) PACKED point limb rows ride as sort
     payload (y pre-negated where the signed digit is negative, chosen
     between precomputed packed y / -y rows) — the sort IS the permutation,
     no gather anywhere;
  2. the sorted rows are stacked to ONE (2*n32, n) array — every dimension
     128-lane / 8-sublane aligned, nothing is layout-padded;
  3. a run-copy Pallas kernel issues ONE large DMA per bucket:
     slab[:, 128*(start//128) : +P128] -> dense[b].  Mosaic requires the
     lane start/extent of an HBM slice to be 128-aligned, so the window is
     aligned DOWN and carries <= 127 junk-head candidates;
  4. one aligned XLA transpose puts the dense matrix in the kernel's
     (limb-sublane, bucket-lane) layout;
  5. the rounds kernel masks each candidate by its rank: rank = r - rank0
     (rank0 = start mod 128) must lie in [0, p_limit) and below the
     bucket's remaining count — junk head/tail and fix-up double-adds are
     all rejected by the same three comparisons.

The TOP window's digits span only ceil(q / 2^((W-1)c)) values, so it runs
with its own (smaller) bucket-lane count and its own round budget — this is
what frees the window size c from divisibility constraints (the reference's
cost model, multiexp.go:76, is replaced by one weighing kernel slots
against per-window sort cost).

Skew handling: the static round budget covers the Poisson max bucket load;
deeper buckets are consumed by re-running the SAME compiled program with
per-window rank offsets, and pathological skew (all-equal scalars) falls
back to the exact segmented-scan path (msm.msm machinery), whose per-bucket
sums REPLACE the overflowed buckets (select, not add — no cross-program
sort-order coupling)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.point import Affine, Jac, jac_add, jac_select
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fields.kernel_lang import KF, kspec
from .msm import (
    DEFAULT_CHUNK,
    _all_window_buckets,
    _horner_windows,
    _ops_for_curve,
    _weighted_bucket_sums,
    default_window,
    signed_digits,
)

BL = 512  # bucket-tile lane width of the rounds kernel
_SENTINEL = np.uint32(0xFFFFFFFF)  # key2 of invalid fixed-base candidates


def _poisson_rounds(n: int, nb: int, mean: int) -> int:
    """Rounds covering the Poisson max bucket load: mean +
    sqrt(2*mean*ln nb) + O(ln nb) (max of nb Poisson(mean) draws)."""
    import math

    ln_nb = math.log(max(nb, 2))
    p = mean + math.ceil(math.sqrt(2.0 * mean * ln_nb)) + math.ceil(2 * ln_nb)
    return min(p, n)


def _p128_of(P: int) -> int:
    """Dense window extent covering >= P ranks past a <=127 junk head."""
    return -(-(P + 127) // 128) * 128


def _pow2ceil(v: int) -> int:
    return 1 << max(0, (v - 1).bit_length())


def _top_span(modulus: int, c: int) -> int:
    """Number of distinct values the TOP window's digits can take."""
    bits = modulus.bit_length()
    W = -(-(bits + 1) // c)
    return max(1, (modulus >> ((W - 1) * c)) + 2)  # +2: borrow carry headroom


def _plan(n: int, nb: int, modulus: int, c: int) -> tuple:
    """(p128_main, p128_top, nb_top) static schedule for one MSM shape."""
    p_main = _poisson_rounds(n, nb, max(1, n // nb))
    span = _top_span(modulus, c)
    nb_top = min(nb, max(BL, _pow2ceil(span)))
    p_top = _poisson_rounds(n, nb_top, max(1, n // max(1, min(nb_top, span))))
    return _p128_of(p_main), _p128_of(p_top), nb_top


def _pack_rows(n16: int) -> int:
    """Packed 32-bit rows per coordinate."""
    return -(-n16 // 2)


def pack32(a: jax.Array) -> jax.Array:
    """(n16, N) uint32 16-bit storage limbs -> (ceil(n16/2), N) packed."""
    n16 = a.shape[0]
    rows = []
    for j in range(0, n16, 2):
        v = a[j]
        if j + 1 < n16:
            v = v | (a[j + 1] << 16)
        rows.append(v)
    return jnp.stack(rows)


def unpack32(p: jax.Array, n16: int) -> jax.Array:
    """(n32, N) packed -> (n16, N) 16-bit storage limbs."""
    rows = []
    for j in range(n16):
        r = p[j // 2]
        rows.append((r >> 16) if j % 2 else (r & jnp.uint32(0xFFFF)))
    return jnp.stack(rows)


def pack32_np(a: np.ndarray) -> np.ndarray:
    """numpy pack32 for host-built tables; a: (..., n16) trailing limbs."""
    n16 = a.shape[-1]
    out = np.zeros(a.shape[:-1] + (_pack_rows(n16),), np.uint32)
    for j in range(0, n16, 2):
        v = a[..., j].astype(np.uint32)
        if j + 1 < n16:
            v = v | (a[..., j + 1].astype(np.uint32) << 16)
        out[..., j // 2] = v
    return out


# ---------------------------------------------------------------------------
# the run-copy kernel: one DMA per bucket run
# ---------------------------------------------------------------------------


def _run_copy(slab, s128, p128: int, interpret: bool):
    """slab: (R8, cols) uint32 sorted payload rows in HBM (R8 a multiple of
    8, cols a multiple of 128); s128: (nb,) int32 — bucket b's aligned run
    window starts at column 128*s128[b].  Returns dense (nb, R8, p128).
    One DMA per bucket — the gather-free dense build (cols must be >=
    128*max(s128) + p128)."""
    nb = s128.shape[0]
    R8 = slab.shape[0]

    def kernel(s_ref, slab_ref, out_ref, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            slab_ref.at[:, pl.ds(s_ref[b] * 128, p128)], out_ref.at[0], sem)
        cp.start()
        cp.wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, R8, p128), lambda b, s: (b, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nb, R8, p128), jnp.uint32),
        interpret=interpret,
    )(s128, slab)


# ---------------------------------------------------------------------------
# the rounds kernel
# ---------------------------------------------------------------------------


def _rounds_kernel(spec, a_plain, b_plain, n16, n32, n_rounds, p_limit,
                   key_row, d_ref, aux_ref, ox, oy, oz, ozzz, scr):
    """One grid step = one round r over one (BL,) bucket-lane tile.

    d_ref block (1, R, BL): packed x rows then packed y rows (y already
    digit-sign-negated on the MSM path).  With key_row=True (fixed-base
    path) row 0 is a key2 = (lane+1)<<1 | sign (or _SENTINEL) and the y
    negation happens in-kernel.  aux_ref (2, BL) int32: row 0 = rank0 (run
    start mod 128), row 1 = remaining count of the bucket in this pass.
    A candidate is live iff rank = r - rank0 lies in [0, p_limit) and
    below the remaining count (junk head/tail and fix-up double-adds all
    fail these).

    Accumulator in VMEM scratch across the round axis:
    - a == 0 (bn/bls/secp families): HOMOGENEOUS PROJECTIVE with the
      Renes-Costello-Batina COMPLETE mixed add (2015/1060 Alg. 8, the
      j-invariant-0 instance): 11M + 2 small-const muls, NO doubling /
      cancellation / empty-lane branches — completeness covers them (all
      inputs lie in the odd-order G1 subgroup).  Outputs (X, Y, Z).
    - a != 0: XYZZ madd-2008-s + mdbl-2008-s with explicit selects.
      Outputs (X, Y, ZZ, ZZZ)."""
    kf = KF(kspec(spec))
    nk = kf.n
    i = pl.program_id(0)
    r = pl.program_id(1)
    rcb = a_plain == 0

    @pl.when(r == 0)
    def _():
        scr[...] = jnp.zeros(scr.shape, scr.dtype)
        if rcb:
            # projective infinity is (0 : 1 : 0)
            one = [(kf.ks.rk_mod >> (kf.r * j)) & kf.ks.mask
                   for j in range(nk)]
            for j in range(nk):
                if one[j]:
                    scr[nk + j] = jnp.full((BL,), one[j], jnp.uint32)

    rank0 = aux_ref[0]                            # (BL,) int32
    cnt = aux_ref[1]
    rk = r - rank0
    valid = jnp.logical_and(rk >= 0,
                            jnp.logical_and(rk < p_limit, rk < cnt))
    off = 0
    if key_row:
        k2 = d_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, BL), 1)[0]
        bucket = lane + jnp.uint32(1) + (i * BL).astype(jnp.uint32)
        valid = jnp.logical_and(valid, (k2 >> 1) == bucket)
        sign = (k2 & 1) != 0
        off = 1

    x2 = kf.load_packed32([d_ref[0, off + j] for j in range(n32)])
    y2 = kf.load_packed32([d_ref[0, off + n32 + j] for j in range(n32)])
    if key_row:
        y2 = kf.select(sign, kf.neg(y2), y2)

    if rcb:
        b3 = (3 * b_plain) % spec.modulus
        X1 = [scr[j] for j in range(nk)]
        Y1 = [scr[nk + j] for j in range(nk)]
        Z1 = [scr[2 * nk + j] for j in range(nk)]
        t0 = kf.mul(X1, x2)
        t1 = kf.mul(Y1, y2)
        t3 = kf.mul(kf.add(x2, y2), kf.add(X1, Y1))
        t3 = kf.sub(t3, kf.add(t0, t1))
        t4 = kf.add(kf.mul(y2, Z1), Y1)
        Y3 = kf.add(kf.mul(x2, Z1), X1)
        t0 = kf.mul_small(t0, 3)
        t2 = (kf.mul_small(Z1, b3) if b3 <= 64
              else kf.mul(Z1, kf.const_mont(b3, x2)))
        Z3 = kf.add(t1, t2)
        t1 = kf.sub(t1, t2)
        Y3 = (kf.mul_small(Y3, b3) if b3 <= 64
              else kf.mul(Y3, kf.const_mont(b3, x2)))
        X3 = kf.sub(kf.mul(t3, t1), kf.mul(t4, Y3))
        Y3 = kf.add(kf.mul(Y3, t0), kf.mul(t1, Z3))
        Z3 = kf.add(kf.mul(Z3, t4), kf.mul(t0, t3))
        outs = []
        for new_w, acc_w in ((X3, X1), (Y3, Y1), (Z3, Z1)):
            outs.append(kf.select(valid, new_w, acc_w))
        for j in range(nk):
            scr[j] = outs[0][j]
            scr[nk + j] = outs[1][j]
            scr[2 * nk + j] = outs[2][j]

        @pl.when(r == n_rounds - 1)
        def _():
            for ref, val in zip((ox, oy, oz), outs):
                rows = kf.store16(val, n16)
                for i16 in range(n16):
                    ref[i16] = rows[i16]
        return

    X1 = [scr[j] for j in range(nk)]
    Y1 = [scr[nk + j] for j in range(nk)]
    ZZ1 = [scr[2 * nk + j] for j in range(nk)]
    ZZZ1 = [scr[3 * nk + j] for j in range(nk)]

    empty = kf.is_zero(ZZ1)

    # mixed add, madd-2008-s (hyperelliptic.org/EFD xyzz): 8M + 1S
    U2 = kf.mul(x2, ZZ1)
    S2 = kf.mul(y2, ZZZ1)
    Pd = kf.sub(U2, X1)
    Rd = kf.sub(S2, Y1)
    PP = kf.sqr(Pd)
    PPP = kf.mul(Pd, PP)
    Q = kf.mul(X1, PP)
    x3 = kf.sub(kf.sub(kf.sqr(Rd), PPP), kf.double(Q))
    y3 = kf.sub(kf.mul(Rd, kf.sub(Q, x3)), kf.mul(Y1, PPP))
    zz3 = kf.mul(ZZ1, PP)
    zzz3 = kf.mul(ZZZ1, PPP)

    # candidate affine doubling, mdbl-2008-s (for acc == candidate): 3M + 2S
    U = kf.double(y2)
    V = kf.sqr(U)
    Wd = kf.mul(U, V)
    S = kf.mul(x2, V)
    M = kf.mul_small(kf.sqr(x2), 3)
    if a_plain:
        M = kf.add(M, kf.const_mont(a_plain, x2))
    dx3 = kf.sub(kf.sqr(M), kf.double(S))
    dy3 = kf.sub(kf.mul(M, kf.sub(S, dx3)), kf.mul(Wd, y2))

    pz = kf.is_zero(Pd)
    rz = kf.is_zero(Rd)
    dbl = jnp.logical_and(pz, rz)
    cancel = jnp.logical_and(pz, jnp.logical_not(rz))

    one = kf.one_mont(x2)
    zero = kf.zero(x2)
    outs = []
    for add_w, dbl_w, emp_w, acc_w in (
        (x3, dx3, x2, X1),
        (y3, dy3, y2, Y1),
        (zz3, V, one, ZZ1),
        (zzz3, Wd, one, ZZZ1),
    ):
        w = kf.select(dbl, dbl_w, add_w)
        w = kf.select(cancel, zero, w)      # P == -Q -> infinity (ZZ = 0)
        w = kf.select(empty, emp_w, w)      # first point lands as-is
        w = kf.select(valid, w, acc_w)      # masked lane: keep accumulator
        outs.append(w)

    for j in range(nk):
        scr[j] = outs[0][j]
        scr[nk + j] = outs[1][j]
        scr[2 * nk + j] = outs[2][j]
        scr[3 * nk + j] = outs[3][j]

    @pl.when(r == n_rounds - 1)
    def _():
        for ref, val in zip((ox, oy, ozz, ozzz), outs):
            rows = kf.store16(val, n16)
            for i16 in range(n16):
                ref[i16] = rows[i16]


def _run_rounds(spec, a_plain, b_plain, n16, n32, n_rounds, p_limit, key_row,
                nb, interpret, denseT, aux):
    """denseT: (n_rounds, R, nb) dense candidate matrix in kernel layout —
    the R axis is blocked at its FULL extent, which keeps any R legal under
    Mosaic's block-divisibility rule.  aux: (2, nb) int32 (rank0; remaining
    count).  Returns 3 projective (a==0, RCB complete adds) or 4 XYZZ
    bucket coords, each (n16, nb)."""
    R = denseT.shape[1]
    rcb = a_plain == 0
    n_out = 3 if rcb else 4
    body = functools.partial(_rounds_kernel, spec, a_plain, b_plain, n16,
                             n32, n_rounds, p_limit, key_row)
    if rcb:
        kernel = lambda d, a, ox, oy, oz, scr: body(d, a, ox, oy, oz, None,
                                                    scr)
    else:
        kernel = body
    grid = (nb // BL, n_rounds)
    ospec = lambda: pl.BlockSpec((n16, BL), lambda i, r: (0, i))
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n16, nb), jnp.uint32)] * n_out,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, BL), lambda i, r: (r, 0, i)),
            pl.BlockSpec((2, BL), lambda i, r: (0, i)),
        ],
        out_specs=[ospec() for _ in range(n_out)],
        scratch_shapes=[pltpu.VMEM((n_out * kspec(spec).n, BL), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(denseT, aux)


# ---------------------------------------------------------------------------
# XLA glue
# ---------------------------------------------------------------------------


def _proj_to_jac(cs: CurveSpec, X, Y, Z) -> Jac:
    """Homogeneous projective (X : Y : Z) -> Jacobian (X*Z, Y*Z^2, Z)
    (no inversion); Z == 0 maps to the Jacobian point at infinity."""
    f = cs.fp
    z2 = mont.square(f, Z)
    return Jac(mont.mul(f, X, Z), mont.mul(f, Y, z2), Z)


def _xyzz_to_jac(cs: CurveSpec, X, Y, ZZ, ZZZ) -> Jac:
    """(X/ZZ, Y/ZZZ) -> Jacobian with Z = ZZ*ZZZ (7 muls, no inversion);
    ZZ == 0 (empty bucket) maps to the Jacobian point at infinity."""
    f = cs.fp
    t = mont.square(f, ZZZ)          # ZZZ^2
    zz2 = mont.square(f, ZZ)
    zz3 = mont.mul(f, zz2, ZZ)
    xj = mont.mul(f, mont.mul(f, X, ZZ), t)
    yj = mont.mul(f, mont.mul(f, Y, zz3), t)
    zj = mont.mul(f, ZZ, ZZZ)
    return Jac(xj, yj, zj)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _msm_rounds_core(cs: CurveSpec, points: Affine, scalars, c: int,
                     p128_main: int, p128_top: int, nb_top: int,
                     interpret: bool, offsets=None):
    """Returns (windowed bucket Jac tree (L, W, nb), counts (W, nb+1)).

    The W-1 "main" windows run under lax.map: ONE traced window body (compile
    stays flat in W) executed sequentially, so only one window's sorted slab
    and dense matrix are live at a time.  The TOP window runs separately
    with its own round budget AND bucket-lane count (its digits span few
    values — see _plan), then pads its bucket row back to nb.

    offsets (traced (W,) int32, or None): skip that many leading ranks of
    every bucket run — the overflow fix-up reruns this same compiled program
    to consume ranks [off, off+p_limit)."""
    f = cs.fp
    n = points.x.shape[1]
    nb = 1 << (c - 1)
    digits = signed_digits(cs.fr.bits, c, scalars)      # (W, n)
    W = digits.shape[0]
    if offsets is None:
        offsets = jnp.zeros((W,), jnp.int32)
    a_plain = cs.a % f.modulus if cs.a else 0
    b_plain = cs.b % f.modulus
    n16 = f.n_limbs
    n32 = _pack_rows(n16)
    R16 = 2 * n32
    R8 = -(-R16 // 8) * 8
    pxs = list(pack32(points.x))
    pyp = list(pack32(points.y))
    pyn = list(pack32(mont.neg(f, points.y)))
    n128 = -(-n // 128) * 128

    def window_body(p128, nb_w):
        p_limit = p128 - 127

        def body(args):
            d, off = args
            neg = d < 0
            key = jnp.abs(d).astype(jnp.int32)
            pys = [jnp.where(neg, a, b) for a, b in zip(pyn, pyp)]
            sorted_ops = jax.lax.sort([key] + pxs + pys, num_keys=1,
                                      is_stable=False)
            sk = sorted_ops[0]
            edges = jnp.searchsorted(
                sk, jnp.arange(nb + 2, dtype=jnp.int32)).astype(jnp.int32)
            counts = jnp.diff(edges)                     # (nb+1,)
            starts = edges[1 : nb_w + 1]
            stacked = jnp.stack(sorted_ops[1:], axis=0)  # (R16, n)
            if R8 > R16:
                stacked = jnp.pad(stacked, ((0, R8 - R16), (0, 0)))
            stacked = jnp.pad(stacked, ((0, 0), (0, n128 - n + p128)))
            spos = jnp.minimum(starts + off, n128)
            s128 = spos // 128
            rank0 = spos - s128 * 128
            cnt_rem = counts[1 : nb_w + 1] - off
            aux = jnp.stack([rank0, cnt_rem])            # (2, nb_w)
            dense = _run_copy(stacked, s128, p128, interpret)
            denseT = jnp.transpose(dense, (2, 1, 0))     # (p128, R8, nb_w)
            coords = _run_rounds(
                f, a_plain, b_plain, n16, n32, p128, p_limit, False, nb_w,
                interpret, denseT, aux)
            if nb_w < nb:
                pad = ((0, 0), (0, nb - nb_w))
                coords = tuple(jnp.pad(v, pad) for v in coords)
            return (*coords, counts)

        return body

    main = jax.lax.map(
        window_body(p128_main, nb), (digits[:-1], offsets[:-1]))
    top = window_body(p128_top, nb_top)((digits[-1], offsets[-1]))
    merged = tuple(
        jnp.concatenate([a, t[None]], axis=0) for a, t in zip(main, top))
    *coords, counts_all = merged
    arrange = lambda a: jnp.moveaxis(a, 0, 1)           # (n16, W, nb)
    if len(coords) == 3:
        buckets = _proj_to_jac(cs, *(arrange(v) for v in coords))
    else:
        buckets = _xyzz_to_jac(cs, *(arrange(v) for v in coords))
    return buckets, counts_all


@functools.partial(jax.jit, static_argnums=(0, 3))
def _exact_window_buckets(cs: CurveSpec, points: Affine, scalars, c: int):
    """EXACT segmented-scan bucket sums of ALL windows (msm.msm machinery) —
    compiled lazily, only ever executed on pathologically skewed inputs; its
    per-bucket sums REPLACE overflowed buckets wholesale."""
    ops = _ops_for_curve(cs)
    digits = signed_digits(cs.fr.bits, c, scalars)
    nb = 1 << (c - 1)
    return _all_window_buckets(ops, points, digits, nb, DEFAULT_CHUNK)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _reduce_windows(cs: CurveSpec, buckets, c: int):
    ops = _ops_for_curve(cs)
    return _horner_windows(ops, _weighted_bucket_sums(ops, buckets), c)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _merge_overflow(cs: CurveSpec, buckets, c: int, exact, mask):
    """buckets where not mask else exact (mask: (W, nb) bool), then reduce."""
    merged = jac_select(mask, exact, buckets)
    return _reduce_windows(cs, merged, c)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _msm_all(cs: CurveSpec, points: Affine, scalars, c: int,
             p128_main: int, p128_top: int, nb_top: int, interpret: bool,
             offsets=None):
    """End-to-end common path in ONE compiled program: rounds core + window
    reduction.  Returns (result Jac, buckets, counts, max loads (W,)) —
    buckets/counts stay on device for the rare overflow fix-up; only the
    tiny max-load vector is fetched."""
    buckets, counts = _msm_rounds_core(cs, points, scalars, c, p128_main,
                                       p128_top, nb_top, interpret, offsets)
    ops = _ops_for_curve(cs)
    acc = _horner_windows(ops, _weighted_bucket_sums(ops, buckets), c)
    return acc, buckets, counts, jnp.max(counts[:, 1:], axis=1)


def fast_window(n: int, bits: int) -> int:
    """Window choice for the rounds path.  Unlike the reference's cost model
    (multiexp.go:76), the dominant terms here are the per-window payload
    sort (~W * n elements through lax.sort) and the dense kernel-slot count
    (sum of p128 * lanes over windows).  The top window's few-valued digits
    get their own small lane count (_plan), so any c in [10, 17] is legal."""
    q = (1 << bits) - 1
    best, best_cost = None, None
    for c in range(10, 18):
        nb = 1 << (c - 1)
        if nb < BL:
            continue
        W = -(-(bits + 1) // c)
        p128_main, p128_top, nb_top = _plan(n, nb, q, c)
        # measured v5e slot-equivalents: ~1.3 per sorted element (sort
        # ~20ns/elt/window vs ~15ns/kernel slot) + ~1.3M per window of
        # fixed cost (sort pass overheads, searchsorted, dispatch — the
        # 2^18 regime is fixed-cost-bound, see MSM_LAYOUT.md)
        cost = ((W - 1) * p128_main * nb + p128_top * nb_top
                + 13 * W * n // 10 + 1_300_000 * W)
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best if best is not None else 15


def msm_fast(cs: CurveSpec, points: Affine, scalars, c: int | None = None,
             interpret: bool = False) -> Jac:
    """High-throughput MSM (MultiExp, multiexp.go:20): sort-payload + DMA
    run-copy + rounds Pallas kernel, with exact lazy fallback.  points
    (n16, N) affine SoA, scalars plain (n16_fr, N) limb array.  Exact for
    any input."""
    n = points.x.shape[1]
    if c is None:
        c = fast_window(n, cs.fr.bits)
    nb = 1 << (c - 1)
    # pad to a BL-multiple bucket grid and pow2 batch like msm() does
    np2 = max(BL, 1 << max(0, (n - 1).bit_length()))
    if np2 != n:
        pad = np2 - n
        points = Affine(jnp.pad(points.x, ((0, 0), (0, pad))),
                        jnp.pad(points.y, ((0, 0), (0, pad))))
        scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
        n = np2
    assert nb % BL == 0 or nb <= BL, (
        f"bucket count {nb} not compatible with lane tile {BL}; "
        f"use c >= {BL.bit_length()} or adjust BL")
    if nb < BL:
        # small windows: widen c so the kernel lane tile is full
        return msm_fast(cs, points, scalars, c=BL.bit_length(),
                        interpret=interpret)
    p128_main, p128_top, nb_top = _plan(n, nb, cs.fr.modulus, c)
    lim_main = p128_main - 127
    lim_top = p128_top - 127
    n_w = -(-(cs.fr.bits + 1) // c)
    zero_offs = jnp.zeros((n_w,), jnp.int32)
    # always pass an offsets array so the first call and any overflow passes
    # share ONE compiled program
    acc, buckets, counts, maxload = _msm_all(
        cs, points, scalars, c, p128_main, p128_top, nb_top, interpret,
        zero_offs)
    # overflow fix-up (one tiny host fetch per pass): real-world skew (e.g.
    # narrow-bit-width scalars concentrating a window) reruns the SAME
    # compiled rounds program with per-window rank offsets — no new
    # compiles; the exact segmented-scan path remains the last resort for
    # pathological skew (all-equal scalars), replacing overflowed buckets.
    max_h = np.asarray(maxload).astype(np.int64)
    w = max_h.shape[0]
    limits = np.array([lim_main] * (w - 1) + [lim_top], dtype=np.int64)
    consumed = limits.copy()
    merged = False
    for _ in range(3):
        if not (max_h > consumed).any():
            break
        offs = jnp.asarray(np.minimum(consumed, np.iinfo(np.int32).max),
                           dtype=jnp.int32)
        _, buckets2, _, _ = _msm_all(cs, points, scalars, c, p128_main,
                                     p128_top, nb_top, interpret, offs)
        # buckets2 holds ranks [off, off+limit); combine via jac add
        buckets = jac_add(cs, buckets, buckets2)
        merged = True
        consumed = consumed + limits
    if (max_h > consumed).any():
        exact = _exact_window_buckets(cs, points, scalars, c)
        mask = counts[:, 1:] > jnp.asarray(consumed, jnp.int32)[:, None]
        return _merge_overflow(cs, buckets, c, exact, mask)
    if merged:
        acc = _reduce_windows(cs, buckets, c)
    return acc
