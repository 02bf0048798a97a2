"""Cyclotomic squaring + family hard-part ladders vs the host big-int oracle.

The ladder outputs must equal z^(c * Phi_k(p)/r) with the documented family
multiple c (cyclotomic.py) — this is what makes device GT values identical to
the reference's FinalExponentiation."""

import jax
import numpy as np
import pytest

from gnark_crypto_tpu.pairing import cyclotomic as cyc
from gnark_crypto_tpu.towers.stacks import stack


def _phi_k(st):
    # Phi_k(p) for k = 6m: p^(2m... k in {6,12,24}: Phi_k(p) = p^{k/3} - p^{k/6} + 1
    k = st.embedding_degree
    return st.p ** (k // 3) - st.p ** (k // 6) + 1


def _cyclotomic_sample(st, seed_int: int):
    """Host element of the cyclotomic subgroup: x^((p^k-1)/Phi_k(p))."""
    K = st.host_full
    x = K.rand(np.random.default_rng(seed_int))
    e = (st.p ** st.embedding_degree - 1) // _phi_k(st)
    return K.pow(x, e)


@pytest.mark.parametrize("name", ["bn254", "bls12_381", "bls24_315", "bw6_633"])
def test_cyclotomic_square_matches_pow2(name):
    st = stack(name)
    K = st.full
    z_host = _cyclotomic_sample(st, 42)
    z = K.from_ints([z_host])
    got = K.to_ints(jax.jit(lambda a: cyc.cyclotomic_square(st, a))(z))[0]
    want = st.host_full.pow(z_host, 2)
    assert st.host_full.eq(got, want)


def _family_multiple(st):
    if st.family == "bn":
        return 2 * st.seed * (6 * st.seed**2 + 3 * st.seed + 1)
    if st.family in ("bls12", "bls24"):
        return 3
    # bw6: El Housni-Guillevic cofactor at the SIGNED seed
    # (ecc/bw6-761/pairing.go:58, ecc/bw6-633/bw6-633.go:102)
    x0 = st.seed
    return abs(x0 + 1) if st.name == "bw6_761" else abs(x0**5 - x0**4 - x0)


def test_bw6_633_cofactor_pinned():
    """Locks the sign convention: the bw6-633 hard-part cofactor must equal
    the literal from ecc/bw6-633/bw6-633.go:102 (seed is NEGATIVE, so
    |x0^5-x0^4-x0| = u^5+u^4-u with u=|x0|, not u^5-u^4-u)."""
    st = stack("bw6_633")
    assert st.seed == -3218079743
    assert _family_multiple(st) == \
        345131030376204096837580131803633448876874137601


@pytest.mark.parametrize("name", ["bn254", "bls12_381", "bls12_377", "bls24_315"])
def test_hard_part_ladder_exponent(name):
    st = stack(name)
    K = st.full
    z_host = _cyclotomic_sample(st, 7)
    z = K.from_ints([z_host])
    got = K.to_ints(jax.jit(lambda a: cyc.hard_part(st, a))(z))[0]
    want = st.host_full.pow(z_host, _family_multiple(st) * (_phi_k(st) // st.r))
    assert st.host_full.eq(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["bw6_633"])
def test_hard_part_bw6_exponent(name):
    """bw6 hard part must be the exact gnark exponent s * Phi_6(p)/r."""
    st = stack(name)
    K = st.full
    z_host = _cyclotomic_sample(st, 9)
    z = K.from_ints([z_host])
    got = K.to_ints(jax.jit(lambda a: cyc.hard_part(st, a))(z))[0]
    want = st.host_full.pow(z_host, _family_multiple(st) * (_phi_k(st) // st.r))
    assert st.host_full.eq(got, want)
