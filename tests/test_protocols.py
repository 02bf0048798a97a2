"""Tests for sumcheck, iop polynomial forms, SIS, multilinear helpers."""

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# generic mpcsetup update machinery (mpcsetup.go:47-236)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_mpcsetup_update_values_roundtrip():
    import numpy as np

    from gnark_crypto_tpu.curves import bn254
    from gnark_crypto_tpu.pairing import pairing_ctx
    from gnark_crypto_tpu.protocols import mpcsetup
    from gnark_crypto_tpu.towers.reference import twist_curve

    cs = bn254()
    tw = pairing_ctx("bn254")
    tc = twist_curve(tw.ts)
    g2 = (tw.ts.g2x, tw.ts.g2y)
    prev = [
        ("g1", [cs.generator, cs.ref.mul(5, cs.generator)]),
        ("g2", [g2]),
    ]
    proof, nxt = mpcsetup.update_values(cs, tw, 987654321, b"chal", 3, prev)
    rng = np.random.default_rng(0)
    assert mpcsetup.verify_update(cs, tw, proof, b"chal", 3, prev, nxt,
                                  rng=rng)
    # wrong challenge must fail the PoK
    assert not mpcsetup.verify_update(cs, tw, proof, b"other", 3, prev, nxt,
                                      rng=rng)
    # tampered next set must fail the ratio check
    bad = [(k, list(pts)) for k, pts in nxt]
    bad[0][1][1] = cs.ref.mul(7, cs.generator)
    assert not mpcsetup.verify_update(cs, tw, proof, b"chal", 3, prev, bad,
                                      rng=rng)


def test_beacon_contributions_deterministic():
    from gnark_crypto_tpu.curves import bn254
    from gnark_crypto_tpu.protocols import mpcsetup

    q = bn254().fr.modulus
    a = mpcsetup.beacon_contributions(b"h", b"d", b"beacon", 4, q)
    b = mpcsetup.beacon_contributions(b"h", b"d", b"beacon", 4, q)
    assert a == b and len(a) == 4 and all(0 < v < q for v in a)


def test_iop_shift_and_serialization():
    """Shift view (polynomial.go:82) + WriteTo/ReadFrom round-trip (:393)."""
    from gnark_crypto_tpu.protocols import iop

    spec = get_spec("bn254_fr")
    q = spec.modulus
    rng = np.random.default_rng(3)
    n = 8
    coeffs = [int(x) % q for x in rng.integers(0, 2**61, n)]
    P = iop.Polynomial(coeffs=mont.from_ints(spec, coeffs),
                       basis=iop.Basis.CANONICAL, layout=iop.Layout.REGULAR,
                       spec=spec)
    x = 12345678901234567
    d = Domain(spec, n)
    w = d.generator
    # shifted evaluation = evaluation at w^shift * x
    got = P.shifted(3).evaluate(x)
    want = P.evaluate(x * pow(w, 3, q) % q)
    assert got == want
    # serialization round-trip preserves coefficients and form
    blob = P.shifted(2).to_bytes()
    Q = iop.Polynomial.from_bytes(spec, blob)
    assert Q.shift == 2 and Q.basis is P.basis and Q.layout is P.layout
    assert (np.asarray(Q.coeffs) == np.asarray(P.coeffs)).all()


def test_iop_blinding():
    """blind(order): evaluations on the size-n domain unchanged, size
    extended to n+order+1, and the added coefficients are the ZH-multiple
    structure (Polynomial.blind; iop polynomial.go:60 blindedSize)."""
    from gnark_crypto_tpu.protocols import iop

    spec = get_spec("bn254_fr")
    q = spec.modulus
    rng = np.random.default_rng(4)
    n = 8
    coeffs = [int(x) % q for x in rng.integers(0, 2**61, n)]
    P = iop.Polynomial(coeffs=mont.from_ints(spec, coeffs),
                       basis=iop.Basis.CANONICAL, layout=iop.Layout.REGULAR,
                       spec=spec)
    order = 2
    draws = iter([11, 22, 33])
    B = P.blind(order, rng=lambda: next(draws))
    assert B.size == n + order + 1
    d = Domain(spec, n)
    w = d.generator
    for i in (0, 1, 5):
        x = pow(w, i, q)
        assert B.evaluate(x) == P.evaluate(x), f"domain point {i} changed"
    # off-domain the values must differ (b != 0 and x^n != 1)
    assert B.evaluate(7) == (P.evaluate(7) +
                             (11 + 22 * 7 + 33 * 49) * (pow(7, n, q) - 1)) % q
