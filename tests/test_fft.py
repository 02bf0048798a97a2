"""NTT tests vs a pure-Python recursive NTT oracle (mirrors the reference's
fft tests which compare against naive evaluation, fr/fft/fft_test.go)."""

import numpy as np
import pytest

from gnark_crypto_tpu.fields import PF, get_spec, mont
from gnark_crypto_tpu.fft import DIF, DIT, Domain, bit_reverse, fft, fft_inverse, intt, ntt


def ntt_oracle(vals, w, q):
    """Recursive natural-order NTT: out[k] = sum_i vals[i] w^(ik)."""
    n = len(vals)
    if n == 1:
        return list(vals)
    even = ntt_oracle(vals[0::2], (w * w) % q, q)
    odd = ntt_oracle(vals[1::2], (w * w) % q, q)
    out = [0] * n
    wk = 1
    for k in range(n // 2):
        t = (wk * odd[k]) % q
        out[k] = (even[k] + t) % q
        out[k + n // 2] = (even[k] - t) % q
        wk = (wk * w) % q
    return out


FIELDS = ["bn254_fr", "babybear", "goldilocks", "bls12_381_fr"]


@pytest.fixture(params=FIELDS)
def dom(request):
    spec = get_spec(request.param)
    return spec, Domain(spec, 64)


def rand_vals(spec, n, seed=0):
    rng = np.random.default_rng(seed)
    return [int(rng.integers(0, 2**62)) % spec.modulus for _ in range(n)]


def test_powers(dom):
    spec, d = dom
    got = mont.to_ints(spec, d.twiddles)
    w = d.generator
    expect = 1
    for i in range(d.cardinality // 2):
        assert int(got[i]) == expect
        expect = (expect * w) % spec.modulus


def test_ntt_matches_oracle(dom):
    spec, d = dom
    vals = rand_vals(spec, d.cardinality)
    a = mont.from_ints(spec, vals)
    got = mont.to_ints(spec, ntt(d, a))
    want = ntt_oracle(vals, d.generator, spec.modulus)
    assert [int(x) for x in got] == want


def test_dif_dit_roundtrip(dom):
    spec, d = dom
    vals = rand_vals(spec, d.cardinality, 1)
    a = mont.from_ints(spec, vals)
    # FFT(DIF) then FFTInverse(DIT) must be identity (gnark pairing contract)
    b = fft(d, a, DIF)
    c = fft_inverse(d, b, DIT)
    got = mont.to_ints(spec, c)
    assert [int(x) for x in got] == vals


def test_intt_inverts_ntt(dom):
    spec, d = dom
    vals = rand_vals(spec, d.cardinality, 2)
    a = mont.from_ints(spec, vals)
    got = mont.to_ints(spec, intt(d, ntt(d, a)))
    assert [int(x) for x in got] == vals


def test_coset_roundtrip_and_semantics(dom):
    spec, d = dom
    pf = PF(spec.modulus)
    vals = rand_vals(spec, d.cardinality, 3)
    a = mont.from_ints(spec, vals)
    # coset evaluation: out[k] = P(g * w^k)
    got = mont.to_ints(spec, ntt(d, a, coset=True))
    g = d.fr_multiplicative_gen
    # oracle: scale then ntt
    scaled = [(v * pow(g, i, spec.modulus)) % spec.modulus for i, v in enumerate(vals)]
    want = ntt_oracle(scaled, d.generator, spec.modulus)
    assert [int(x) for x in got] == want
    # and round-trip
    back = mont.to_ints(spec, intt(d, ntt(d, a, coset=True), coset=True))
    assert [int(x) for x in back] == vals


def test_bit_reverse():
    a = np.arange(8).reshape(1, 8)
    out = np.asarray(bit_reverse(a, axis=1))
    assert list(out[0]) == [0, 4, 2, 6, 1, 5, 3, 7]


@pytest.mark.slow
def test_ntt_fused_matches_xla_path():
    """Fused Pallas passes (interpret mode = the purego analogue) must be
    bit-identical to the stage-at-a-time XLA path at the minimum fused size."""
    import jax

    from gnark_crypto_tpu.fft import fused_available, ntt_fused

    spec = get_spec("bn254_fr")
    n = 1 << 14
    assert fused_available(spec, n)
    d = Domain(spec, n, with_coset_tables=False)
    vals = rand_vals(spec, n, seed=3)
    a = mont.from_ints(spec, vals)
    want = np.asarray(jax.jit(ntt)(d, a))
    got = np.asarray(ntt_fused(d, a, interpret=True))
    assert (want == got).all()
    back = np.asarray(ntt_fused(d, jax.numpy.asarray(got), inverse=True,
                                interpret=True))
    assert (back == np.asarray(a)).all()
