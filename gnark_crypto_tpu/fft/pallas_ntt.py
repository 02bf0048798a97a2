"""Fused multi-stage NTT as Pallas TPU kernels.

The XLA stage-at-a-time path (fft.py) launches 3 HBM-roundtrip kernels per
butterfly stage; at 2^20 that is ~20x off the chip's roofline.  This module is
the TPU-native analogue of the reference's blocked FFT hot loop
(innerDIFWithTwiddles + unrolled base kernels, ecc/bn254/fr/fft/fft.go:261,
:377): the transform is decomposed into k passes of R<=2^7 butterfly stages
each; one pass keeps its whole (R x 128-lane) tile VMEM-resident in
lazy-reduction kernel-radix form (fields/kernel_lang.py: limbs < 2^13,
values < 2q, no conditional subtracts between ops) and canonicalizes only on
store.

Mathematical decomposition (classic Cooley-Tukey four-step, generalized to k
factors): for n = R1 * R2 * ... * Rk, view the array as (R1, n/R1).  The first
log2(R1) DIF stages of the full transform touch only the R1 axis and equal a
standard size-R1 DIF per column followed by a pointwise "connecting twiddle"
T[j, c] = w_n^{br(j) * c} (br = bit-reverse in R1); the remaining stages are an
independent size-(n/R1) NTT per output row -- recurse.  Every pass therefore
transforms a SUBLANE axis with the batch on the 128-lane axis; only the final
factor would transform lanes, so one physical transpose is inserted before the
last pass and the inverse transpose is folded into the final natural-order
gather (which a DIF NTT needs anyway).

Pass kernel data flow per grid step (pre-index i, lane-tile j):
  HBM (16, 1, R, 128) storage-limb tile -> VMEM -> kernel radix (~20 limbs)
  -> log2(R) butterfly stages (add/sub/lazy mont-mul, twiddles from a
  stage-concatenated VMEM table) -> connecting-twiddle mul -> canonicalize
  -> HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import mont
from ..fields.kernel_lang import KF, kspec
from ..fields.spec import FieldSpec
from .domain import Domain

CT = 128          # lane-tile width of every pass
MAX_LOG_R = 7     # butterfly stages per pass (VMEM budget)
MIN_FUSED_LOG2N = 14


def plan_splits(L: int) -> list[int]:
    """Factor log2(n) into per-pass stage counts, each <= MAX_LOG_R, with the
    LAST >= MAX_LOG_R so every pass keeps >= 128 lanes busy."""
    assert L >= 2 * MAX_LOG_R
    k = -(-L // MAX_LOG_R)
    rest = L - MAX_LOG_R
    parts = []
    for i in range(k - 1):
        take = -(-rest // (k - 1 - i))
        parts.append(take)
        rest -= take
    assert rest == 0 and all(1 <= p <= MAX_LOG_R for p in parts)
    return parts + [MAX_LOG_R]


def _bitrev(x: int, bits: int) -> int:
    return int(bin(x)[2:].zfill(bits)[::-1], 2) if bits else 0


# ---------------------------------------------------------------------------
# table construction (host ints -> device arrays, done once per Domain)
# ---------------------------------------------------------------------------


# stages with butterfly half-distance below this use the roll formulation
# (sub-8-sublane slicing/stacking makes Mosaic emit pathological relayouts)
ROLL_MIN_HALF = 8


def _stage_twiddles(spec: FieldSpec, w_R: int, R: int) -> jax.Array:
    """Concatenated per-stage DIF twiddles for a size-R transform, each limb
    row broadcast over CT lanes.  Slicing stages (half >= ROLL_MIN_HALF) store
    the compact half-length vector w_R^(k * 2^s); roll stages store a full
    R-length vector tw[r] = w_R^((r mod half) * 2^s) aligned to every sublane
    position.  Stage offsets are recomputed identically in the kernel."""
    q = spec.modulus
    vals = []
    logR = R.bit_length() - 1
    for s in range(logR):
        half = R >> (s + 1)
        base = pow(w_R, 1 << s, q)
        pows = []
        cur = 1
        for _ in range(half):
            pows.append(cur)
            cur = cur * base % q
        if half >= ROLL_MIN_HALF:
            vals.extend(pows)
        else:
            vals.extend([pows[r % half] for r in range(R)])
    pad = -len(vals) % 8
    vals.extend([0] * pad)
    tab = np.stack([spec.mont_limbs(v) for v in vals], axis=1)  # (L, rows)
    return jnp.asarray(np.repeat(tab[:, :, None], CT, axis=2))


def _stage_offsets(R: int) -> list[int]:
    offs = []
    o = 0
    for s in range(R.bit_length() - 1):
        half = R >> (s + 1)
        offs.append(o)
        o += half if half >= ROLL_MIN_HALF else R
    return offs


def _connect_matrix(spec: FieldSpec, w_N: int, R: int, post: int) -> jax.Array:
    """T[j, c] = w_N^(br_R(j) * c)  (N = R*post), shape (n_limbs, R, post).

    Built on device by vectorized doubling over the c axis: log2(post) mont
    muls totalling R*post products (the closed-form of the reference's
    preComputeTwiddles doubling, fr/fft/domain.go:138)."""
    q = spec.modulus
    w_rows = [pow(w_N, _bitrev(j, R.bit_length() - 1), q) for j in range(R)]
    t = mont.one(spec, (R, 1))
    cur = mont.from_ints(spec, w_rows).reshape(spec.n_limbs, R, 1)
    while t.shape[2] < post:
        t = jnp.concatenate([t, mont.mul(spec, t, cur)], axis=2)
        if t.shape[2] < post:
            cur = mont.mul(spec, cur, cur)
    return t[:, :, :post]


def build_pass_tables(spec: FieldSpec, n: int, root: int):
    """All per-pass device tables for a fused size-n NTT with root w_n=root.
    Returns (splits, [(stage_tw, connect_or_None), ...])."""
    q = spec.modulus
    L = n.bit_length() - 1
    splits = plan_splits(L)
    tables = []
    N = n
    w = root
    for i, Lr in enumerate(splits):
        R = 1 << Lr
        post = N // R
        w_R = pow(w, post, q)
        stage_tw = _stage_twiddles(spec, w_R, R)
        connect = None if i == len(splits) - 1 else _connect_matrix(
            spec, w, R, post)
        tables.append((stage_tw, connect))
        N = post
        w = pow(root, n // N, q)
    return splits, tables


# ---------------------------------------------------------------------------
# the pass kernel
# ---------------------------------------------------------------------------


def _pass_kernel(spec: FieldSpec, log_r: int, with_connect: bool, n16: int,
                 *refs):
    if with_connect:
        x_ref, tw_ref, t_ref, o_ref = refs
    else:
        x_ref, tw_ref, o_ref = refs
        t_ref = None
    R = 1 << log_r
    kf = KF(kspec(spec))
    a = kf.load16([x_ref[i, 0] for i in range(n16)])      # limbs of (R, CT)
    offs = _stage_offsets(R)

    for s in range(log_r):
        half = R >> (s + 1)
        blocks = 1 << s
        off = offs[s]
        if half >= ROLL_MIN_HALF:
            u = [l.reshape(blocks, 2, half, CT)[:, 0] for l in a]
            v = [l.reshape(blocks, 2, half, CT)[:, 1] for l in a]
            ss = kf.add(u, v)
            d = kf.sub(u, v)
            tw = kf.load16([tw_ref[i, off:off + half, :][None]
                            for i in range(n16)])
            d = kf.mul(d, tw)
            a = [jnp.stack([su, dv], axis=1).reshape(R, CT)
                 for su, dv in zip(ss, d)]
        else:
            # roll formulation: partner via sublane rotation, full-width ops,
            # select sum at "u" rows / twiddled diff at "v" rows
            b = [pltpu.roll(l, R - half, 0) for l in a]  # b[r] = a[r+half]
            c = [pltpu.roll(l, half, 0) for l in a]    # c[r] = a[r-half]
            ss = kf.add(a, b)
            d = kf.sub(c, a)
            if half > 1:
                tw = kf.load16([tw_ref[i, off:off + R, :]
                                for i in range(n16)])
                d = kf.mul(d, tw)
            r_idx = jax.lax.broadcasted_iota(jnp.uint32, (R, CT), 0)
            is_u = (r_idx & jnp.uint32(half)) == 0
            a = kf.select(is_u, ss, d)

    if t_ref is not None:
        t = kf.load16([t_ref[i] for i in range(n16)])
        a = kf.mul(a, t)

    out = kf.store16(a, n16)
    for i in range(n16):
        o_ref[i, 0] = out[i]


def _run_pass(spec: FieldSpec, pre: int, R: int, post: int, interpret: bool,
              x, stage_tw, connect):
    """x: (n16, pre, R, post) -> same shape, size-R twisted DIF along axis 2."""
    n16 = spec.n_limbs
    log_r = R.bit_length() - 1
    grid = (pre, post // CT)
    with_connect = connect is not None
    in_specs = [
        pl.BlockSpec((n16, 1, R, CT), lambda i, j: (0, i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n16, stage_tw.shape[1], CT), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, stage_tw]
    if with_connect:
        in_specs.append(pl.BlockSpec((n16, R, CT), lambda i, j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(connect)
    kernel = functools.partial(_pass_kernel, spec, log_r, with_connect, n16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n16, 1, R, CT), lambda i, j: (0, i, 0, j),
                               memory_space=pltpu.VMEM),
        # the ~20-limb kernel-radix working set exceeds Mosaic's default 16M
        # scoped-vmem budget; the chip's physical VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _unscramble_indices(splits: list[int]) -> "jnp.ndarray":
    """Traced permutation src(f) mapping output frequency f to its position in
    the post-pass layout (j_k, j_1, ..., j_{k-1}) with j_i = br(f_i)."""
    # field i of f (low->high) has splits[i] bits
    total = sum(splits)
    f = jnp.arange(1 << total, dtype=jnp.int32)

    def rev_field(x, bits):
        r = jnp.zeros_like(x)
        for b in range(bits):
            r = r | (((x >> b) & 1) << (bits - 1 - b))
        return r

    k = len(splits)
    pre_bits = total - splits[-1]
    # j_k (top field of f) lands in the HIGH bits of src
    shift = 0
    fields = []
    for bits in splits:
        fields.append(rev_field((f >> shift) & ((1 << bits) - 1), bits))
        shift += bits
    src = fields[-1] << pre_bits
    # (j_1 .. j_{k-1}) big-endian within the low pre_bits
    off = pre_bits
    for i in range(k - 1):
        off -= splits[i]
        src = src | (fields[i] << off)
    return src


def _br_idx(bits: int) -> np.ndarray:
    n = 1 << bits
    idx = np.arange(n)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


def _unscramble(x, splits: list[int]):
    """Natural-order gather decomposed into per-axis bit-reversal takes and
    one transpose.  A flat take at 2^24 moves 4-byte elements at the chip's
    slow gather rate (~0.4 s); viewing the state as (j_k, j_1, ..., j_{k-1})
    turns the same permutation into k small-axis row gathers (contiguous
    multi-KB rows -> DMA-speed) plus one transpose, with the one unavoidable
    innermost-axis reversal deferred until AFTER the transpose moves that
    axis off the lane dimension."""
    k = len(splits)
    L = x.shape[0]
    n = x.shape[1]
    if k < 3:
        return jnp.take(x, _unscramble_indices(splits), axis=1)
    dims = (1 << splits[-1],) + tuple(1 << s for s in splits[:-1])
    widths = (splits[-1],) + tuple(splits[:-1])
    xs = x.reshape((L,) + dims)
    # reverse every axis except the (innermost) j_{k-1}
    for ax in range(k - 1):
        xs = jnp.take(xs, jnp.asarray(_br_idx(widths[ax])), axis=1 + ax)
    # (0, j_k, j_1, ..., j_{k-1}) -> (0, f_k, f_{k-1}, ..., f_1)
    perm = (0, 1) + tuple(range(k, 1, -1))
    xs = jnp.transpose(xs, perm)
    # the old innermost axis (j_{k-1}) now sits at position 2
    xs = jnp.take(xs, jnp.asarray(_br_idx(widths[k - 1])), axis=2)
    return xs.reshape(L, n)


def fused_available(spec: FieldSpec, n: int) -> bool:
    try:
        kspec(spec)
    except AssertionError:
        return False
    return n.bit_length() - 1 >= MIN_FUSED_LOG2N and (n & (n - 1)) == 0


def _get_tables(domain: Domain, inverse: bool):
    cache = getattr(domain, "_fused_tables", None)
    if cache is None:
        cache = {}
        object.__setattr__(domain, "_fused_tables", cache)
    if inverse not in cache:
        root = domain.generator_inv if inverse else domain.generator
        cache[inverse] = build_pass_tables(domain.spec, domain.cardinality,
                                           root)
    return cache[inverse]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _ntt_fused_impl(spec: FieldSpec, splits: tuple, inverse: bool,
                    interpret: bool, a, *tables_flat):
    n = a.shape[1]
    tables = [(tables_flat[2 * i], tables_flat[2 * i + 1])
              for i in range(len(splits))]
    x = a
    pre = 1
    N = n
    for i, Lr in enumerate(splits):
        R = 1 << Lr
        stage_tw, connect = tables[i]
        last = i == len(splits) - 1
        if last:
            # (n16, pre, R) -> (n16, R, pre): the final factor transforms
            # what is now the sublane axis, batch (pre) on lanes
            x = jnp.swapaxes(x.reshape(spec.n_limbs, pre, R), 1, 2)
            x = x.reshape(spec.n_limbs, 1, R, pre)
            x = _run_pass(spec, 1, R, pre, interpret, x, stage_tw, None)
        else:
            post = N // R
            x = x.reshape(spec.n_limbs, pre, R, post)
            x = _run_pass(spec, pre, R, post, interpret, x, stage_tw, connect)
            pre *= R
            N = post
    x = x.reshape(spec.n_limbs, n)
    out = _unscramble(x, list(splits))
    if inverse:
        out = mont.mul_const(spec, out, pow(n, -1, spec.modulus))
    return out


def ntt_fused(domain: Domain, a, inverse: bool = False,
              interpret: bool = False):
    """Natural-order -> natural-order forward (or inverse, scaled) NTT via
    fused Pallas passes.  a: (n_limbs, n) storage-limb Montgomery array.

    Semantics match fft.ntt / fft.intt (natural in/out); use this entry for
    large standalone transforms (n >= 2^14)."""
    spec = domain.spec
    n = domain.cardinality
    assert fused_available(spec, n), f"fused NTT unavailable for n={n}"
    assert a.shape == (spec.n_limbs, n)
    splits, tables = _get_tables(domain, inverse)
    flat = []
    for stage_tw, connect in tables:
        flat.extend([stage_tw, connect])
    return _ntt_fused_impl(spec, tuple(splits), inverse, interpret, a, *flat)
