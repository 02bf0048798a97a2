"""Tests for sumcheck, iop polynomial forms, SIS, multilinear helpers."""

import numpy as np

from gnark_crypto_tpu.fft import Domain, ntt
from gnark_crypto_tpu.fiatshamir.transcript import Transcript
from gnark_crypto_tpu.fields import PF, get_spec, mont
from gnark_crypto_tpu.hashes.sis import new_rsis
from gnark_crypto_tpu.protocols import iop
from gnark_crypto_tpu.protocols.multilin import eq_table, evaluate, fold, hypercube_sum
from gnark_crypto_tpu.protocols.sumcheck import SumcheckProof, prove, verify


def test_multilin_fold_eval():
    spec = get_spec("babybear")
    pf = PF(spec.modulus)
    rng = np.random.default_rng(0)
    v = 3
    vals = [int(x) % spec.modulus for x in rng.integers(0, 2**31, 1 << v)]
    m = mont.from_ints(spec, vals)
    rs = [5, 7, 11]
    got = int(mont.to_ints(spec, evaluate(spec, m, rs)[:, None])[0])
    # oracle: multilinear extension sum_x eq(r,x) f(x)
    want = 0
    for x in range(1 << v):
        term = vals[x]
        for i in range(v):
            bit = (x >> (v - 1 - i)) & 1
            term = term * (rs[i] if bit else (1 - rs[i])) % spec.modulus
        want = (want + term) % spec.modulus
    assert got == want
    # eq table consistency: evaluate == <eq_table, vals>
    tab = eq_table(spec, rs)
    ip = int(mont.to_ints(spec, mont.inner_product(spec, tab, m)[:, None])[0])
    assert ip == want


def test_sumcheck_roundtrip():
    spec = get_spec("bn254_fr")
    rng = np.random.default_rng(1)
    v = 3
    n = 1 << v
    m1 = mont.from_ints(spec, [int(x) % spec.modulus for x in rng.integers(0, 2**62, n)])
    m2 = mont.from_ints(spec, [int(x) % spec.modulus for x in rng.integers(0, 2**62, n)])
    names = [f"sc{i}" for i in range(v)]
    claimed, proof = prove(spec, [m1, m2], Transcript("sha256", names), names)
    assert verify(spec, claimed, proof, Transcript("sha256", names), names)
    # tampered claim fails
    assert not verify(spec, (claimed + 1) % spec.modulus, proof,
                      Transcript("sha256", names), names)
    # tampered round poly fails
    bad = SumcheckProof(
        round_polys=[[(proof.round_polys[0][0] + 1) % spec.modulus]
                     + proof.round_polys[0][1:]] + proof.round_polys[1:],
        final_evals=proof.final_evals,
    )
    assert not verify(spec, claimed, bad, Transcript("sha256", names), names)


def test_iop_forms_roundtrip():
    spec = get_spec("bn254_fr")
    rng = np.random.default_rng(2)
    n = 32
    d = Domain(spec, n)
    vals = [int(x) % spec.modulus for x in rng.integers(0, 2**62, n)]
    p = iop.Polynomial(mont.from_ints(spec, vals), iop.Basis.CANONICAL,
                       iop.Layout.REGULAR, spec)
    lag = p.to_lagrange(d).to_regular(d)
    # lagrange values must equal ntt(coeffs)
    want = mont.to_ints(spec, ntt(d, p.coeffs))
    got = mont.to_ints(spec, lag.coeffs)
    assert list(got) == list(want)
    back = lag.to_canonical(d).to_regular(d)
    assert list(mont.to_ints(spec, back.coeffs)) == vals
    cos = p.to_lagrange_coset(d).to_regular(d)
    back2 = cos.to_canonical(d).to_regular(d)
    assert list(mont.to_ints(spec, back2.coeffs)) == vals


def test_sis_linearity_and_determinism():
    rs = new_rsis("babybear", seed=7, log_two_degree=4, log_two_bound=8,
                  max_elements=4)
    q = rs.spec.modulus
    h1 = rs.hash_elements([1, 2, 3, 4])
    h2 = rs.hash_elements([1, 2, 3, 4])
    assert h1 == h2
    # linearity over Z (small coefficients, no limb overflow):
    a = [1, 2, 3, 4]
    b = [5, 6, 7, 8]
    ab = [6, 8, 10, 12]
    ha = rs.hash_elements(a)
    hb = rs.hash_elements(b)
    hab = rs.hash_elements(ab)
    assert hab == [(x + y) % q for x, y in zip(ha, hb)]
