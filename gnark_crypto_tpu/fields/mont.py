"""Generic multi-limb Montgomery arithmetic on uint32 arrays (16-bit limbs).

The batched, TPU-native equivalent of the reference's per-field element code
(ecc/bn254/fr/element.go + field/asm/element_4w_amd64.s).  Differences by design:

- The primitive unit is an *array of elements*, not one element.  Layout is
  structure-of-arrays with a LEADING limb axis: shape (n_limbs, *batch), so the
  large batch axis lands on TPU lanes and the tiny limb axis does not waste a
  128-lane tile.
- Limbs are 16 bits held in uint32.  The CIOS inner step t + a*b + c is exact
  in uint32 (max (2^16-1)^2 + 2*(2^16-1) = 2^32-1), mirroring the 64-bit ADX
  carry chain of the reference (ecc/bn254/fr/element_purego.go:44, CIOS per
  "Faster Montgomery Multiplication ... for SNARKs", TCHES 2023).
- Loops over limb indices are Python loops unrolled at trace time (the
  trace-time analogue of goff's code generation); everything stays elementwise
  over the batch so XLA fuses it into a handful of kernels.

All functions are pure and shape-polymorphic over the batch; `spec` must be a
static (hashable) FieldSpec when used under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec, limbs_to_int

_MASK = jnp.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS


def _bc(c: np.ndarray, ndim: int):
    """Broadcast a (n_limbs,) constant against a (n_limbs, *batch) array."""
    return jnp.asarray(c, dtype=jnp.uint32).reshape(c.shape + (1,) * ndim)


def _align(a: jax.Array, b: jax.Array):
    """Pad trailing singleton batch dims so (n_limbs, *batch_a) and
    (n_limbs, *batch_b) broadcast limb-wise (NOT by trailing-axis alignment —
    a (n,) element must act as a batch-() constant against (n, B))."""
    nd = max(a.ndim, b.ndim)
    if a.ndim < nd:
        a = a.reshape(a.shape + (1,) * (nd - a.ndim))
    if b.ndim < nd:
        b = b.reshape(b.shape + (1,) * (nd - b.ndim))
    return a, b


def zeros(spec: FieldSpec, batch_shape=()) -> jax.Array:
    return jnp.zeros((spec.n_limbs,) + tuple(batch_shape), dtype=jnp.uint32)


def const(spec: FieldSpec, value: int, batch_shape=(), mont: bool = True) -> jax.Array:
    """Constant element broadcast to batch_shape (Montgomery form by default)."""
    limbs = spec.mont_limbs(value) if mont else spec.limbs(value)
    return jnp.broadcast_to(
        _bc(limbs, len(batch_shape)), (spec.n_limbs,) + tuple(batch_shape)
    )


def one(spec: FieldSpec, batch_shape=()) -> jax.Array:
    return const(spec, 1, batch_shape)


# ---------------------------------------------------------------------------
# carry / compare helpers
# ---------------------------------------------------------------------------


def _carry_scan(t: jax.Array):
    """Carry-propagate a (k, *batch) redundant-limb array via lax.scan.
    Returns (norm (k, *batch) limbs < 2^16, carry_out)."""
    c0 = jnp.zeros(t.shape[1:], dtype=jnp.uint32)

    def body(c, ti):
        v = ti + c
        return v >> _SHIFT, v & _MASK

    c, out = jax.lax.scan(body, c0, t)
    return out, c


def _carry_prop(limbs: list[jax.Array]):
    """List-based wrapper over _carry_scan (kept for small unrolled users)."""
    out, c = _carry_scan(jnp.stack(limbs, 0))
    return [out[i] for i in range(out.shape[0])], c


def _cond_sub_q_arr(spec: FieldSpec, t: jax.Array, overflow: jax.Array):
    """Return t - q if (overflow or t >= q) else t; t: (n, *batch) < 2^16."""
    q = jnp.asarray(spec.q_limbs, dtype=jnp.uint32)
    b0 = jnp.zeros(t.shape[1:], dtype=jnp.uint32)

    def body(borrow, args):
        ti, qi = args
        v = ti - qi - borrow  # wraps mod 2^32
        return v >> 31, v & _MASK

    borrow, d = jax.lax.scan(body, b0, (t, q))
    use_sub = jnp.logical_or(overflow.astype(bool), borrow == 0)
    return jnp.where(use_sub[None], d, t)


def _cond_sub_q(spec: FieldSpec, t: list[jax.Array], overflow: jax.Array):
    out = _cond_sub_q_arr(spec, jnp.stack(t, 0), overflow)
    return [out[i] for i in range(out.shape[0])]


def _stack(limbs: list[jax.Array]) -> jax.Array:
    return jnp.stack(limbs, axis=0)


def _unstack(a: jax.Array) -> list[jax.Array]:
    return [a[i] for i in range(a.shape[0])]


# ---------------------------------------------------------------------------
# ring ops
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    a, b = _align(a, b)
    s, c = _carry_scan(a + b)
    return _cond_sub_q_arr(spec, s, c)


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    a, b = _align(a, b)
    q = jnp.asarray(spec.q_limbs, dtype=jnp.uint32)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    b0 = jnp.zeros(batch, dtype=jnp.uint32)

    def sub_body(borrow, args):
        ai, bi = args
        v = ai - bi - borrow
        return v >> 31, v & _MASK

    ab = jnp.broadcast_to(a, (spec.n_limbs,) + batch)
    bb = jnp.broadcast_to(b, (spec.n_limbs,) + batch)
    borrow, d = jax.lax.scan(sub_body, b0, (ab, bb))

    def fix_body(c, args):
        di, qi = args
        v = di + qi * borrow + c
        return v >> _SHIFT, v & _MASK

    _, out = jax.lax.scan(fix_body, jnp.zeros_like(borrow), (d, q))
    return out


def neg(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return sub(spec, zeros(spec, a.shape[1:]), a)


def double(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return add(spec, a, a)


# Pallas dispatch: on TPU, batched muls go through the VMEM-resident kernel
# (fields/pallas_mont.py) — measured 17x the XLA-scan path on v5e.  The scan
# path remains the CPU/test ("purego"-analogue) and small-batch fallback.
_PALLAS_MIN_N = 256


def _use_pallas(batch_elems: int) -> bool:
    import jax as _jax

    try:
        return (
            batch_elems >= _PALLAS_MIN_N
            and _jax.default_backend() == "tpu"
        )
    except Exception:
        return False


def mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a*b*R^-1 mod q.

    CIOS with a carry-save (redundant) accumulator: per outer limb i the n
    partial products a_i*b and m*q are computed as single vectorized uint32
    muls, split lo/hi, and accumulated WITHOUT rippling carries — limbs of the
    accumulator stay < n*2^18 << 2^32, so one final carry propagation
    suffices.  This keeps the trace ~n*12 primitives instead of ~2n^2*5 and
    turns the inner loops into full-width vector ops (the VPU-shaped
    equivalent of the ADX carry chains in field/asm/element_4w_amd64.s).

    On TPU, large batches route through the Pallas kernel instead."""
    a, b = _align(a, b)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    n_elems = 1
    for d in batch:
        n_elems *= d
    if _use_pallas(n_elems):
        from . import pallas_mont

        ab = jnp.broadcast_to(a, (spec.n_limbs,) + batch).reshape(spec.n_limbs, -1)
        bb = jnp.broadcast_to(b, (spec.n_limbs,) + batch).reshape(spec.n_limbs, -1)
        block = min(pallas_mont.DEFAULT_BLOCK, 1 << max(8, (n_elems - 1).bit_length()))
        out = pallas_mont.mul(spec, ab, bb, block, False)
        return out.reshape((spec.n_limbs,) + batch)
    n = spec.n_limbs
    q = _bc(spec.q_limbs, max(a.ndim, b.ndim) - 1)
    qinv = jnp.uint32(spec.qinv_neg)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    zero_row = jnp.zeros((1,) + batch, dtype=jnp.uint32)
    bb = jnp.broadcast_to(b, (n,) + batch)
    t0 = jnp.zeros((n + 1,) + batch, dtype=jnp.uint32)

    def body(t, ai):
        p = ai[None] * bb  # (n, batch) exact 32-bit products of 16-bit limbs
        m = ((t[0] + (p[0] & _MASK)) * qinv) & _MASK
        mq = m[None] * q
        lo = (p & _MASK) + (mq & _MASK)            # (n, batch), < 2^17
        hi = (p >> _SHIFT) + (mq >> _SHIFT)        # (n, batch), < 2^17
        t = t + jnp.concatenate([lo, zero_row], 0) \
              + jnp.concatenate([zero_row, hi], 0)
        # limb 0 is ≡ 0 mod 2^16 now; fold its high bits into limb 1 and shift
        carry0 = t[0] >> _SHIFT
        t = jnp.concatenate([(t[1] + carry0)[None], t[2:], zero_row], 0)
        return t, None

    ab = jnp.broadcast_to(a, (n,) + batch)
    t, _ = jax.lax.scan(body, t0, ab)
    # final full carry propagation of the redundant limbs;
    # t < 2q < 2^(16n+1): out[n] is the overflow bit
    out, _ = _carry_scan(t)
    return _cond_sub_q_arr(spec, out[:n], out[n])


def square(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mul(spec, a, a)


def mul_const(spec: FieldSpec, a: jax.Array, k: int) -> jax.Array:
    """Multiply by a small host constant k (uses repeated addition for tiny k)."""
    if -16 <= k < 0:  # tiny negative constants (tower nonresidues -1/-4/-5)
        return neg(spec, mul_const(spec, a, -k))
    k %= spec.modulus
    if k == 0:
        return zeros(spec, a.shape[1:])
    if k == 1:
        return a
    if k == 2:
        return add(spec, a, a)
    if k == 3:
        return add(spec, add(spec, a, a), a)
    if k == 4:
        d = add(spec, a, a)
        return add(spec, d, d)
    return mul(spec, a, const(spec, k, ()).reshape(spec.n_limbs, *([1] * (a.ndim - 1))))


def from_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Montgomery form -> canonical residue (multiply by 1 = Montgomery reduce)."""
    plain_one = _bc(spec.limbs(1), a.ndim - 1)
    return mul(spec, a, plain_one)


def to_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    r2 = _bc(spec.r2_limbs, a.ndim - 1)
    return mul(spec, a, r2)


# ---------------------------------------------------------------------------
# predicates / select
# ---------------------------------------------------------------------------


def is_zero(spec: FieldSpec, a: jax.Array) -> jax.Array:
    acc = a[0]
    for i in range(1, spec.n_limbs):
        acc = acc | a[i]
    return acc == 0


def eq(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    a, b = _align(a, b)
    acc = a[0] ^ b[0]
    for i in range(1, spec.n_limbs):
        acc = acc | (a[i] ^ b[i])
    return acc == 0


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask ? a : b — mask has batch shape (constant-time Select analogue)."""
    a, b = _align(a, b)
    return jnp.where(mask[None], a, b)


# ---------------------------------------------------------------------------
# exponentiation / inversion / sqrt
# ---------------------------------------------------------------------------


def pow_const(spec: FieldSpec, a: jax.Array, e: int) -> jax.Array:
    """a^e for a fixed host-side integer exponent — the analogue of the
    reference's fixed-exponent chains (ecc/bn254/fr/element_exp.go).

    Small exponents unroll at trace time; large ones use 4-bit fixed windows
    under lax.scan (15-entry table + 4 squares + 1 table mul per digit:
    ~334 muls for a 254-bit exponent vs ~510 for scanned square-and-multiply
    where the conditional multiply is computed either way)."""
    if e == 0:
        return one(spec, a.shape[1:])
    bits = bin(e)[2:]
    if len(bits) <= 8:  # unrolled fast path for tiny exponents
        result = None
        for bit in bits:
            if result is not None:
                result = mul(spec, result, result)
            if bit == "1":
                result = a if result is None else mul(spec, result, a)
        return result

    if len(bits) <= 32:
        bit_arr = jnp.asarray(
            np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

        def body(res, bit):
            res = mul(spec, res, res)
            res = select(jnp.broadcast_to(bit, res.shape[1:]),
                         mul(spec, res, a), res)
            return res, None

        result, _ = jax.lax.scan(body, a, bit_arr)
        return result

    # 4-bit windowed path: digits MSB-first
    n_digits = -(-len(bits) // 4)
    digs = [(e >> (4 * i)) & 0xF for i in range(n_digits)][::-1]
    tab = [one(spec, a.shape[1:]), a]
    for _ in range(14):
        tab.append(mul(spec, tab[-1], a))
    table = jnp.stack(tab, axis=0)          # (16, n_limbs, *batch)

    def wbody(res, d):
        for _ in range(4):
            res = mul(spec, res, res)
        td = jax.lax.dynamic_index_in_dim(table, d, axis=0, keepdims=False)
        return mul(spec, res, td), None

    init = jax.lax.dynamic_index_in_dim(
        table, jnp.int32(digs[0]), axis=0, keepdims=False)
    result, _ = jax.lax.scan(
        wbody, init, jnp.asarray(np.array(digs[1:], dtype=np.int32)))
    return result


def inverse(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Fermat inverse a^(q-2); Inverse(0) = 0 by that formula automatically.

    TPU decision note (vs the reference's Pornin constant-time ext-GCD,
    ecc/bn254/fp/element.go:1173): Pornin's iteration is ~(2*bits/62)*62 ≈
    620 data-dependent limb steps — cheap scalar ops on a CPU, but on TPU
    each step is a full-width vector op inside lax.while_loop with the same
    sequential depth class as Fermat's ~330 dependent multiplications, and
    it vectorizes WORSE (per-lane divergent iteration counts must run to the
    constant-time bound).  Fermat wins or ties in every regime here: batched
    inversions use batch_inverse (2 muls/element amortized), serial ones are
    latency-bound either way.  The reference's choice is arch-specific, not
    protocol-relevant (both are exact)."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inverse(spec: FieldSpec, a: jax.Array, axis: int = -1) -> jax.Array:
    """Montgomery batch inversion along one batch axis via parallel prefix
    products (jax.lax.associative_scan) — the TPU-parallel form of the
    reference's BatchInvert (ecc/bn254/fp/element.go:658).

    Zero entries are passed through as 0 (same convention as the reference).
    Cost: ~2*log2(N)+3 muls per element + one Fermat inverse, vs one Fermat
    inverse per element.
    """
    if axis < 0:
        axis += a.ndim
    assert axis >= 1, "axis 0 is the limb axis"
    zmask = is_zero(spec, a)
    aa = select(zmask, one(spec, a.shape[1:]), a)
    # prefix[i] = a0*...*ai  (scan over the chosen batch axis)
    prefix = jax.lax.associative_scan(
        lambda x, y: mul(spec, x, y), aa, axis=axis
    )
    n_el = a.shape[axis]
    total = jax.lax.index_in_dim(prefix, n_el - 1, axis=axis, keepdims=True)
    inv_total = inverse(spec, total)
    # inv(ai) = inv_prefix[i] * prefix[i-1];  inv_prefix[i] = inv_total * suffix...
    # use: inv_prefix = reverse(assoc_scan(reverse(shifted)))? simpler:
    # inv(ai) = prefix[i-1] * inv(prefix[i]) ; inv(prefix[i]) = inv_total * (a_{i+1}*...*a_{n-1})
    suffix = jax.lax.associative_scan(
        lambda x, y: mul(spec, x, y), aa, axis=axis, reverse=True
    )
    # suffix[i] = ai*...*a_{n-1};  inv(ai) = prefix[i-1] * suffix[i+1] * inv_total
    shift_p = jnp.roll(prefix, 1, axis=axis)
    ones_ = one(spec, a.shape[1:])
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape[1:], axis - 1)
    shift_p = select(idx == 0, ones_, shift_p)
    shift_s = jnp.roll(suffix, -1, axis=axis)
    shift_s = select(idx == n_el - 1, ones_, shift_s)
    out = mul(spec, mul(spec, shift_p, shift_s), inv_total)
    out = select(zmask, zeros(spec, a.shape[1:]), out)
    return out


def legendre(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Returns int32 batch array in {-1, 0, 1}."""
    l = pow_const(spec, a, (spec.modulus - 1) // 2)
    one_ = one(spec, a.shape[1:])
    out = jnp.where(eq(spec, l, one_), jnp.int32(1), jnp.int32(-1))
    return jnp.where(is_zero(spec, a), jnp.int32(0), out)


def sqrt(spec: FieldSpec, a: jax.Array):
    """Batched constant-structure Tonelli-Shanks.

    Returns (root, is_qr_mask).  For non-residues root is unspecified.
    Mirrors Sqrt in the reference (ecc/bn254/fp/element.go:1142) but as a
    data-independent O(s^2) squaring schedule (TPU-friendly: no early exit).
    """
    q, s = spec.modulus, spec.two_adicity
    odd = (q - 1) >> s
    if s == 1:
        root = pow_const(spec, a, (q + 1) // 4)
        ok = eq(spec, mul(spec, root, root), a)
        return root, ok
    # r = a^((odd+1)/2), t = a^odd;  t lies in the 2-Sylow subgroup <c>, c = z^odd
    w = pow_const(spec, a, (odd - 1) // 2)
    r = mul(spec, a, w)          # a^((odd+1)/2)
    t = mul(spec, r, w)          # a^odd
    # dlog of t base c, bit by bit: c^(2^(s-1)) = -1.
    # Precompute c^(2^j) host-side.
    pf_c = pow(spec.nonresidue, odd, q)
    c_pows = []  # c^(2^j) mod q, j = 0..s-1
    x = pf_c
    for _ in range(s):
        c_pows.append(x)
        x = (x * x) % q
    ndim = a.ndim - 1
    one_ = one(spec, a.shape[1:])
    c_inv = pow(pf_c, -1, q)
    # Host-precomputed tables: c^(-2^k) and the half powers c^(-2^(k-1))
    # (identity at k=0 since d_0 = 0 for quadratic residues).
    cinv_tab = np.stack([spec.mont_limbs(pow(c_inv, 1 << k, q)) for k in range(s)])
    chalf_tab = np.stack(
        [spec.mont_limbs(1)]
        + [spec.mont_limbs(pow(c_inv, 1 << (k - 1), q)) for k in range(1, s)]
    )
    # Invariant: t_k = t * c^(-(d mod 2^k)) = c^((d>>k)*2^k);
    # bit k of d comes from t_k^(2^(s-1-k)) = (-1)^(d_k).
    xs = (
        jnp.arange(s, dtype=jnp.int32),
        jnp.asarray(cinv_tab),
        jnp.asarray(chalf_tab),
    )

    def body(carry, x):
        t, r = carry
        k, cinv_l, chalf_l = x
        u = jax.lax.fori_loop(0, s - 1 - k, lambda _, u: mul(spec, u, u), t)
        bit = jnp.logical_not(eq(spec, u, one_))  # d_k = 1 iff u == -1
        cc = cinv_l.reshape(spec.n_limbs, *([1] * ndim))
        ch = chalf_l.reshape(spec.n_limbs, *([1] * ndim))
        t = select(bit, mul(spec, t, cc), t)
        r = select(bit, mul(spec, r, ch), r)
        return (t, r), None

    (t, r), _ = jax.lax.scan(body, (t, r), xs)
    root = r
    ok = eq(spec, mul(spec, root, root), a)
    ok = jnp.logical_or(ok, is_zero(spec, a))
    return root, ok


# ---------------------------------------------------------------------------
# vector reductions (the Vector.Sum / InnerProduct analogues, vector.go:29)
# ---------------------------------------------------------------------------


def sum_axis(spec: FieldSpec, a: jax.Array, axis: int = 1) -> jax.Array:
    """Tree-fold sum along one batch axis (log-depth mont adds)."""
    if axis < 0:
        axis += a.ndim
    assert axis >= 1
    m = a.shape[axis]

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    while m > 1:
        h = m // 2
        merged = add(spec, take(a, slice(0, h)), take(a, slice(h, 2 * h)))
        if m % 2:
            merged = jnp.concatenate([merged, take(a, slice(m - 1, m))], axis=axis)
            m = h + 1
        else:
            m = h
        a = merged
    return jnp.squeeze(take(a, slice(0, 1)), axis=axis)


def inner_product(spec: FieldSpec, a: jax.Array, b: jax.Array, axis: int = 1) -> jax.Array:
    return sum_axis(spec, mul(spec, a, b), axis=axis)


def powers_traced(spec: FieldSpec, x: jax.Array, n: int) -> jax.Array:
    """[1, x, ..., x^(n-1)] for a traced scalar x of shape (n_limbs,).
    Doubling construction: log2(n) vectorized muls."""
    arr = one(spec, (1,))
    if n == 1:
        return arr
    cur = x.reshape(spec.n_limbs, 1)
    while arr.shape[1] < n:
        arr = jnp.concatenate([arr, mul(spec, arr, cur)], axis=1)
        if arr.shape[1] < n:
            cur = mul(spec, cur, cur)
    return arr[:, :n]


# ---------------------------------------------------------------------------
# host <-> device conversion (tests, serialization)
# ---------------------------------------------------------------------------


def from_ints(spec: FieldSpec, values, mont: bool = True) -> jax.Array:
    """numpy/list of python ints -> (n_limbs, *batch) uint32 device array.

    Large batches route through the native host-ops library (native/hostops.cpp
    — batched byte decode + CIOS Montgomery conversion); the per-element
    big-int path remains as the toolchain-free fallback."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    n = flat.shape[0]
    if n >= 64:
        from .. import native

        if native.get_lib() is not None:
            q = spec.modulus
            nb = 2 * spec.n_limbs
            data = b"".join((int(v) % q).to_bytes(nb, "big") for v in flat)
            aos = native.bytes_to_limbs(data, nb, spec.n_limbs)
            if mont:
                aos = native.mont_mul_batch(spec, aos, spec.r2_limbs)
            out = np.ascontiguousarray(aos.T)
            return jnp.asarray(out.reshape((spec.n_limbs,) + arr.shape))
    out = np.empty((spec.n_limbs, n), dtype=np.uint32)
    for i, v in enumerate(flat):
        v = int(v) % spec.modulus
        out[:, i] = spec.mont_limbs(v) if mont else spec.limbs(v)
    return jnp.asarray(out.reshape((spec.n_limbs,) + arr.shape))


def to_ints(spec: FieldSpec, a, mont: bool = True) -> np.ndarray:
    """(n_limbs, *batch) array -> numpy object array of canonical ints."""
    host = np.asarray(a)
    flat = host.reshape(spec.n_limbs, -1)
    n = flat.shape[1]
    if n >= 64:
        from .. import native

        if native.get_lib() is not None:
            aos = np.ascontiguousarray(flat.T)
            if mont:
                aos = native.mont_mul_batch(spec, aos, spec.limbs(1))
            nb = 2 * spec.n_limbs
            data = native.limbs_to_bytes(aos, nb).tobytes()
            out = np.empty(n, dtype=object)
            for i in range(n):
                out[i] = int.from_bytes(data[i * nb:(i + 1) * nb], "big")
            return out.reshape(host.shape[1:])
    if mont:
        a = from_mont(spec, a)
        host = np.asarray(a)
        flat = host.reshape(spec.n_limbs, -1)
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = limbs_to_int(flat[:, i])
    return out.reshape(host.shape[1:])
