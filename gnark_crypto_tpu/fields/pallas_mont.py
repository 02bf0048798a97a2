"""Pallas TPU kernel for batched Montgomery multiplication.

The reference ships hand-scheduled ADX/AVX-512 assembly for the CIOS inner
loop (field/asm/element_4w_amd64.s, REDUCE macro :16-29); this is the
TPU-native equivalent (SURVEY.md §2: "the TPU build must implement these as
Pallas kernels").  Same carry-save CIOS algorithm as fields/mont.py mul(),
but fully unrolled inside one VMEM-resident kernel:

- one grid step processes a (n_limbs, BLOCK) tile of the element batch;
- all limb rows live in VMEM/vector registers for the whole multiply, so the
  ~n^2 partial products never round-trip through HBM (the XLA scan-based
  path writes the (n+1, N) carry-save accumulator back each outer step);
- uint32 lane ops only (VPU); products of 16-bit limbs are exact in 32 bits.

API: mul(spec, a, b) with the same contract as mont.mul for 2-D inputs
(n_limbs, N).  Set interpret=True (or run on CPU) for the purego-analogue
interpreter mode (SURVEY.md §4: test strategy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

_MASK = jnp.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS

DEFAULT_BLOCK = 2048


def _mul_kernel_body(spec: FieldSpec, a_ref, b_ref, o_ref):
    # NB: all scalar constants are Python ints (weak-typed) — Pallas kernels
    # cannot capture traced jnp scalars.
    n = spec.n_limbs
    q = [int(x) for x in spec.q_limbs]
    qinv = int(spec.qinv_neg)
    mask = LIMB_MASK

    a = [a_ref[i, :] for i in range(n)]
    b = [b_ref[i, :] for i in range(n)]
    zero = jnp.zeros_like(a[0])

    # carry-save CIOS accumulator t[0..n] (bounded < n*2^18 << 2^32)
    t = [zero] * (n + 1)
    for i in range(n):
        p = [a[i] * b[j] for j in range(n)]
        m = ((t[0] + (p[0] & mask)) * qinv) & mask
        mq = [m * qj for qj in q]
        lo = [(p[j] & mask) + (mq[j] & mask) for j in range(n)]
        hi = [(p[j] >> _SHIFT) + (mq[j] >> _SHIFT) for j in range(n)]
        nt = [t[j] + lo[j] for j in range(n)] + [t[n]]
        for j in range(1, n + 1):
            nt[j] = nt[j] + hi[j - 1]
        carry0 = nt[0] >> _SHIFT
        t = [nt[1] + carry0] + nt[2:] + [zero]

    # full carry propagation; t < 2q so one overflow limb suffices
    out = []
    c = zero
    for j in range(n + 1):
        v = t[j] + c
        out.append(v & mask)
        c = v >> _SHIFT
    overflow = out[n]

    # conditional subtract q (branchless)
    borrow = zero
    d = []
    for j in range(n):
        v = out[j] - q[j] - borrow
        d.append(v & mask)
        borrow = v >> 31
    use_sub = jnp.logical_or(overflow > 0, borrow == 0)
    for j in range(n):
        o_ref[j, :] = jnp.where(use_sub, d[j], out[j])


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mul(spec: FieldSpec, a: jax.Array, b: jax.Array,
        block: int = DEFAULT_BLOCK, interpret: bool = False) -> jax.Array:
    """Montgomery product over a 2-D batch (n_limbs, N); pads N to `block`."""
    n, N = a.shape
    assert n == spec.n_limbs and b.shape == a.shape
    Np = -(-N // block) * block
    if Np != N:
        pad = ((0, 0), (0, Np - N))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)

    kernel = functools.partial(_mul_kernel_body, spec)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, Np), jnp.uint32),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(a, b)
    return out[:, :N] if Np != N else out
