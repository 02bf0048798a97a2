"""GT utilities (pairing/gt.py) vs the host big-int oracle: Karabina
compressed squaring + decompression, torus compression round-trip, and GT
subgroup membership (e12.go:133-287, :723-792)."""

import jax
import numpy as np
import pytest

from gnark_crypto_tpu.pairing import cyclotomic as cyc
from gnark_crypto_tpu.pairing import gt
from gnark_crypto_tpu.towers.stacks import stack


def _phi_k(st):
    k = st.embedding_degree
    return st.p ** (k // 3) - st.p ** (k // 6) + 1


def _cyclotomic_sample(st, seed_int: int):
    K = st.host_full
    x = K.rand(np.random.default_rng(seed_int))
    e = (st.p ** st.embedding_degree - 1) // _phi_k(st)
    return K.pow(x, e)


@pytest.mark.parametrize("name", ["bn254"])
def test_karabina_square_roundtrip(name):
    """compressed-square then decompress == plain cyclotomic square."""
    st = stack(name)
    K = st.full
    z_host = _cyclotomic_sample(st, 5)
    z = K.from_ints([z_host])

    f = jax.jit(lambda a: gt.decompress_karabina(
        st, gt.cyclotomic_square_compressed(st, a)))
    got = K.to_ints(f(z))[0]
    want = st.host_full.pow(z_host, 2)
    assert st.host_full.eq(got, want)


@pytest.mark.parametrize("name", ["bn254"])
def test_karabina_square_chain(name):
    """a run of compressed squares + one decompress == z^(2^k) (the Expt
    usage pattern, e12_pairing.go:16)."""
    st = stack(name)
    K = st.full
    z_host = _cyclotomic_sample(st, 6)
    z = K.from_ints([z_host])

    def chain(a):
        for _ in range(3):
            a = gt.cyclotomic_square_compressed(st, a)
        return gt.decompress_karabina(st, a)

    got = K.to_ints(jax.jit(chain)(z))[0]
    want = st.host_full.pow(z_host, 8)
    assert st.host_full.eq(got, want)


@pytest.mark.parametrize("name", ["bn254"])
def test_torus_roundtrip(name):
    st = stack(name)
    K = st.full
    z_host = _cyclotomic_sample(st, 7)
    z = K.from_ints([z_host])
    f = jax.jit(lambda a: gt.decompress_torus(st, gt.compress_torus(st, a)))
    got = K.to_ints(f(z))[0]
    assert st.host_full.eq(got, z_host)


@pytest.mark.slow
def test_gt_subgroup_membership():
    st = stack("bn254")
    K = st.full
    rng = np.random.default_rng(8)
    member = _cyclotomic_sample(st, 9)
    # a cyclotomic element that is NOT in the order-r subgroup: GT has order
    # Phi_k(p) = r * c with c > 1; take h^(Phi/r / gcd...) -- simplest: a
    # random cyclotomic element is outside GT with overwhelming probability
    outsider = _cyclotomic_sample(st, 10)
    z = K.from_ints([st.host_full.pow(member, _phi_k(st) // st.r), outsider])
    got = np.asarray(jax.jit(lambda a: gt.gt_is_in_subgroup(st, a))(z))
    assert bool(got[0]) is True
    assert bool(got[1]) is False
