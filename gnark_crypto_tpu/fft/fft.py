"""Radix-2 NTT over a Domain, vectorized stage-at-a-time.

Semantics mirror the reference's API contract (ecc/bn254/fr/fft/fft.go:18-29):
- fft(a, DIF): natural-order input -> bit-reversed output
- fft(a, DIT): bit-reversed input -> natural-order output
- fft_inverse mirrors with inverse twiddles and a final 1/N scale
- coset=True evaluates on the coset g*<w> (premultiply for DIF forward,
  postmultiply with 1/N folded for DIT inverse), like fft.go:31-110.

Each stage is one reshape + Montgomery add/sub/mul over the whole array, so the
butterfly "hot loop" (fft.go:261 innerDIFWithTwiddles) becomes three fused
vector kernels per stage instead of a goroutine tree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields import mont
from .domain import Domain

DIF = "DIF"
DIT = "DIT"


def bit_reverse_indices(n: int) -> np.ndarray:
    log2n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for b in range(log2n):
        rev |= ((idx >> b) & 1) << (log2n - 1 - b)
    return rev


def bit_reverse(a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Permute to bit-reversed order along one axis (BitReverse, bitreverse.go:17).

    A gather is cheap on TPU; no COBRA-style cache blocking needed.  The index
    vector is built from an on-device iota (not a host constant: at 2^24 a
    materialized index array would embed 128 MB into the HLO payload).
    """
    n = a.shape[axis]
    log2n = n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros_like(idx)
    for b in range(log2n):
        rev = rev | (((idx >> b) & 1) << (log2n - 1 - b))
    return jnp.take(a, rev, axis=axis)


def _dif_stage(spec, a, tw0, stage: int, log2n: int):
    """One DIF stage: size = n >> stage, pairs at distance size/2."""
    n_limbs = a.shape[0]
    n = a.shape[1]
    size = n >> stage
    half = size // 2
    blocks = n // size
    x = a.reshape(n_limbs, blocks, 2, half)
    u, v = x[:, :, 0, :], x[:, :, 1, :]
    s = mont.add(spec, u, v)
    d = mont.sub(spec, u, v)
    if half > 1:  # last stage's twiddle is w^0 = 1
        tw = tw0[:, ::blocks][:, :half].reshape(n_limbs, 1, half)
        d = mont.mul(spec, d, tw)
    out = jnp.stack([s, d], axis=2)
    return out.reshape(n_limbs, n)


def _dit_stage(spec, a, tw0, stage: int):
    """One DIT stage with size = 2 << stage (stage runs 0..log2n-1 upward)."""
    n_limbs = a.shape[0]
    n = a.shape[1]
    size = 2 << stage
    half = size // 2
    blocks = n // size
    x = a.reshape(n_limbs, blocks, 2, half)
    u, v = x[:, :, 0, :], x[:, :, 1, :]
    if half > 1:
        tw = tw0[:, :: blocks][:, :half].reshape(n_limbs, 1, half)
        v = mont.mul(spec, v, tw)
    s = mont.add(spec, u, v)
    d = mont.sub(spec, u, v)
    out = jnp.stack([s, d], axis=2)
    return out.reshape(n_limbs, n)


def _mul_table(spec, a, table):
    return mont.mul(spec, a, table)


def fft(domain: Domain, a, decimation: str = DIF, coset: bool = False):
    spec = domain.spec
    n = domain.cardinality
    assert a.shape[1] == n
    tw0 = domain.twiddles
    if decimation == DIF:
        if coset:
            a = _mul_table(spec, a, domain.coset_table)
        for stage in range(domain.log2n):
            a = _dif_stage(spec, a, tw0, stage, domain.log2n)
        return a
    else:  # DIT: bit-reversed input, natural output
        if coset:
            # input is bit-reversed: premultiply with bit-reversed coset table
            ct = bit_reverse(domain.coset_table, axis=1)
            a = _mul_table(spec, a, ct)
        for stage in range(domain.log2n):
            a = _dit_stage(spec, a, tw0, stage)
        return a


def fft_inverse(domain: Domain, a, decimation: str = DIF, coset: bool = False):
    spec = domain.spec
    n = domain.cardinality
    assert a.shape[1] == n
    tw0 = domain.twiddles_inv
    if decimation == DIF:
        # natural -> bit-reversed; coset postprocessing must happen on
        # bit-reversed indices
        for stage in range(domain.log2n):
            a = _dif_stage(spec, a, tw0, stage, domain.log2n)
        if coset:
            ct = bit_reverse(domain.coset_table_inv, axis=1)
            a = _mul_table(spec, a, ct)
        a = mont.mul_const(spec, a, domain.cardinality_inv)
        return a
    else:  # DIT: bit-reversed input -> natural output
        for stage in range(domain.log2n):
            a = _dit_stage(spec, a, tw0, stage)
        if coset:
            a = _mul_table(spec, a, domain.coset_table_inv)
        a = mont.mul_const(spec, a, domain.cardinality_inv)
        return a


def ntt(domain: Domain, a, coset: bool = False):
    """Natural-order in, natural-order out forward NTT."""
    return bit_reverse(fft(domain, a, DIF, coset), axis=1)


def intt(domain: Domain, a, coset: bool = False):
    """Natural-order in, natural-order out inverse NTT."""
    return fft_inverse(domain, bit_reverse(a, axis=1), DIT, coset)
