"""FFT domain: roots-of-unity subgroup + twiddle tables, on device.

TPU-native analogue of the reference's fft.Domain (ecc/bn254/fr/fft/domain.go:
25-53, NewDomain :67, preComputeTwiddles :138).  Differences:

- twiddle/coset tables are built on device by doubling (log N vectorized
  Montgomery muls) instead of serial host loops;
- a single stage-0 table (w^0 .. w^(N/2-1)) is stored and per-stage twiddles
  are strided views of it, instead of per-stage materialized tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.spec import FieldSpec


@functools.partial(jax.jit, static_argnums=(0, 2))
def _powers_ladder(spec: FieldSpec, base_arr, n: int):
    arr = mont.one(spec, (1,))
    cur = base_arr                      # base^len with len = arr length
    while arr.shape[1] < n:
        arr = jnp.concatenate([arr, mont.mul(spec, arr, cur)], axis=1)
        if arr.shape[1] < n:
            cur = mont.mul(spec, cur, cur)
    return arr[:, :n]


def powers(spec: FieldSpec, base: int, n: int):
    """Device array [1, b, b^2, ..., b^(n-1)] (mont form) via doubling.

    One jitted ladder per (spec, n) with the base as a traced argument —
    eager per-step dispatch costs ~20 remote compiles per call on the
    tunneled-TPU platform (measured: the first SRS-2^20 KZG open spent
    over an hour in it)."""
    if n == 1:
        return mont.one(spec, (1,))
    return _powers_ladder(spec, mont.const(spec, base, (1,)), n)


class Domain:
    """Radix-2 evaluation domain of size 2^log2n over spec's field."""

    def __init__(self, spec: FieldSpec, cardinality: int, with_coset_tables: bool = True):
        n = 1
        log2n = 0
        while n < cardinality:
            n *= 2
            log2n += 1
        assert log2n <= spec.two_adicity, (
            f"domain 2^{log2n} exceeds field two-adicity {spec.two_adicity}"
        )
        self.spec = spec
        self.cardinality = n
        self.log2n = log2n
        q = spec.modulus
        g = spec.multiplicative_generator
        assert g != 0, f"no multiplicative generator registered for {spec.name}"
        # generator of the size-n subgroup (domain.go:67 semantics)
        self.generator = pow(g, (q - 1) >> log2n, q)
        self.generator_inv = pow(self.generator, -1, q)
        self.cardinality_inv = pow(n, -1, q)
        self.fr_multiplicative_gen = g
        self.fr_multiplicative_gen_inv = pow(g, -1, q)
        # stage-0 twiddles w^0..w^(n/2-1); per-stage = strided views
        m = max(n // 2, 1)
        self.twiddles = powers(spec, self.generator, m)
        self.twiddles_inv = powers(spec, self.generator_inv, m)
        if with_coset_tables:
            self.coset_table = powers(spec, g, n)
            # g^-i with 1/n NOT folded (folded at use site, like domain.go)
            self.coset_table_inv = powers(spec, self.fr_multiplicative_gen_inv, n)
        else:
            self.coset_table = None
            self.coset_table_inv = None


# Domain is a pytree: the twiddle/coset tables are LEAVES, so a jitted
# function taking a Domain receives them as runtime arguments — never as
# closure-captured HLO constants (at 2^24 the tables are ~0.5 GB; embedding
# them in the program blew the remote-compile payload limit).  The scalar
# fields are static aux data (hashable -> stable jit cache keys).
_DOMAIN_LEAVES = ("twiddles", "twiddles_inv", "coset_table", "coset_table_inv")
_DOMAIN_AUX = (
    "spec", "cardinality", "log2n", "generator", "generator_inv",
    "cardinality_inv", "fr_multiplicative_gen", "fr_multiplicative_gen_inv",
)


def _domain_flatten(d: "Domain"):
    return (
        tuple(getattr(d, k) for k in _DOMAIN_LEAVES),
        tuple(getattr(d, k) for k in _DOMAIN_AUX),
    )


def _domain_unflatten(aux, leaves) -> "Domain":
    d = object.__new__(Domain)
    for k, v in zip(_DOMAIN_AUX, aux):
        setattr(d, k, v)
    for k, v in zip(_DOMAIN_LEAVES, leaves):
        setattr(d, k, v)
    return d


jax.tree_util.register_pytree_node(Domain, _domain_flatten, _domain_unflatten)
