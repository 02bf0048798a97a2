"""Plain (non-modular) multi-limb integer arithmetic on uint32 arrays of
16-bit limbs — device-side big-int helpers for GLV scalar decomposition.

The reference does this with math/big on the host per scalar
(ecc/utils.go:142 SplitScalar); here the whole scalar batch is decomposed on
device with vectorized limb ops, so MSM/scalar-mul pipelines never round-trip
scalars through the host.

Layout matches fields/mont.py: (n_limbs, *batch) uint32, little-endian 16-bit
limbs.  All functions are shape-polymorphic over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK

_MASK = jnp.uint32(LIMB_MASK)


def from_int(x: int, n_limbs: int, batch_shape=()) -> jax.Array:
    assert 0 <= x < (1 << (LIMB_BITS * n_limbs))
    limbs = np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)], np.uint32
    )
    return jnp.broadcast_to(
        jnp.asarray(limbs).reshape((n_limbs,) + (1,) * len(batch_shape)),
        (n_limbs,) + tuple(batch_shape),
    )


def mul(a: jax.Array, b: jax.Array, out_limbs: int | None = None) -> jax.Array:
    """Full product of two limb arrays (any limb counts), carry-save
    schoolbook with one final carry propagation.

    Accumulator bound: min(na, nb) products per output limb, each < 2^32 of
    lo+hi parts each < 2^17 * min(na,nb) << 2^32 for na,nb <= 64."""
    na, nb = a.shape[0], b.shape[0]
    nout = na + nb if out_limbs is None else out_limbs
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    acc = jnp.zeros((nout + 1,) + batch, jnp.uint32)
    for i in range(na):
        if i >= nout:
            break
        width = min(nb, nout - i)
        p = a[i][None] * b[:width]           # (width, batch) exact u32
        lo = p & _MASK
        hi = p >> LIMB_BITS
        acc = acc.at[i:i + width].add(lo)
        acc = acc.at[i + 1:i + width + 1].add(hi)
    # final carry propagation
    def body(c, t):
        v = t + c
        return v >> LIMB_BITS, v & _MASK

    _, out = jax.lax.scan(body, jnp.zeros(batch, jnp.uint32), acc)
    return out[:nout]


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum (same limb count), dropping overflow beyond the limb count."""
    assert a.shape[0] == b.shape[0]
    def body(c, t):
        v = t[0] + t[1] + c
        return v >> LIMB_BITS, v & _MASK

    _, out = jax.lax.scan(
        body, jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), jnp.uint32),
        (a, b))
    return out


def sub(a: jax.Array, b: jax.Array):
    """(a - b) mod 2^(16n) and the borrow-out (1 where b > a)."""
    assert a.shape[0] == b.shape[0]
    def body(borrow, t):
        v = t[0] - t[1] - borrow
        return v >> 31, v & _MASK

    borrow, out = jax.lax.scan(
        body, jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), jnp.uint32),
        (a, b))
    return out, borrow


def shift_right_limbs(a: jax.Array, k: int) -> jax.Array:
    """Drop the low k limbs (i.e. >> 16k)."""
    return a[k:]


def bit(a: jax.Array, i: int) -> jax.Array:
    """Bit i as a bool batch array."""
    return ((a[i // LIMB_BITS] >> (i % LIMB_BITS)) & 1) == 1


def neg_abs(a: jax.Array, is_neg: jax.Array, n_limbs: int) -> jax.Array:
    """|x| for x given as a two's-complement-style (value, sign) pair where
    the caller knows the true value is -(2^(16n) - a) when is_neg."""
    zero = jnp.zeros_like(a)
    comp, _ = sub(zero, a)
    return jnp.where(is_neg[None], comp, a)
