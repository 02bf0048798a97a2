"""Device tower kernels vs the Python tower oracle (mirrors fptower tests)."""

import numpy as np
import pytest

from gnark_crypto_tpu.towers import (
    PairingOracle,
    RefE12,
    bls12_377_tower,
    bls12_381_tower,
    bn254_tower,
    tower,
)

TOWERS = [
    ("bn254", bn254_tower),
    ("bls12_381", bls12_381_tower),
    ("bls12_377", bls12_377_tower),
]


def rand_e12(ts, rng, n):
    p = ts.p

    def re2():
        return (int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % p,
                int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % p)

    return [
        (tuple(re2() for _ in range(3)), tuple(re2() for _ in range(3)))
        for _ in range(n)
    ]


@pytest.fixture(params=TOWERS, ids=lambda t: t[0])
def tw(request):
    name, ts_f = request.param
    return tower(name), ts_f()


def test_e12_mul_square_inv(tw):
    dev, ts = tw
    oracle = RefE12(ts)
    rng = np.random.default_rng(0)
    n = 4
    va, vb = rand_e12(ts, rng, n), rand_e12(ts, rng, n)
    a, b = dev.e12_from_oracle(va), dev.e12_from_oracle(vb)

    got = dev.e12_to_oracle(dev.e12_mul(a, b))
    want = [oracle.mul(x, y) for x, y in zip(va, vb)]
    assert list(got) == want

    got = dev.e12_to_oracle(dev.e12_square(a))
    assert list(got) == [oracle.square(x) for x in va]

    got = dev.e12_to_oracle(dev.e12_inverse(a))
    assert list(got) == [oracle.inv(x) for x in va]

    got = dev.e12_to_oracle(dev.e12_conj(a))
    assert list(got) == [oracle.conj(x) for x in va]


def test_e12_frobenius(tw):
    dev, ts = tw
    oracle = RefE12(ts)
    rng = np.random.default_rng(1)
    va = rand_e12(ts, rng, 2)
    a = dev.e12_from_oracle(va)
    for power in (1, 2, 3):
        got = dev.e12_to_oracle(dev.e12_frobenius(a, power))
        want = [oracle.pow(x, ts.p**power) for x in va]
        assert list(got) == want, f"frobenius^{power} mismatch"


def test_e12_pow(tw):
    dev, ts = tw
    oracle = RefE12(ts)
    rng = np.random.default_rng(2)
    va = rand_e12(ts, rng, 2)
    a = dev.e12_from_oracle(va)
    for e in (1, 2, 7, 65537):
        got = dev.e12_to_oracle(dev.e12_pow(a, e))
        assert list(got) == [oracle.pow(x, e) for x in va], f"pow {e}"


def test_e12_mul_line_matches_full():
    """Sparse line mul (Tower.e12_mul_line) == full e12 mul on sparse lines
    (MulBy034/MulBy014 analogue), both twist types."""
    import numpy as np

    from gnark_crypto_tpu.pairing.pairing import pairing_ctx

    for name in ("bn254", "bls12_381"):
        tw = pairing_ctx(name)
        rng = np.random.default_rng(11)
        p = tw.ts.p
        re2 = lambda: (int(rng.integers(0, 2**63)) % p,
                       int(rng.integers(0, 2**63)) % p)
        f_host = [re2() for _ in range(6)]
        slots = (0, 1, 3) if tw.ts.twist == "D" else (0, 3, 5)
        line_host = [re2() if k in slots else (0, 0) for k in range(6)]

        def to_e12(coeffs):
            c = [tw.e2_from_ints([v]) for v in coeffs]
            from gnark_crypto_tpu.towers.tower import E6, E12

            return E12(E6(c[0], c[2], c[4]), E6(c[1], c[3], c[5]))

        f = to_e12(f_host)
        line = to_e12(line_host)
        import jax

        got = jax.jit(lambda a, b: tw.e12_mul_line(a, b))(f, line)
        want = jax.jit(lambda a, b: tw.e12_mul(a, b))(f, line)
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            assert (np.asarray(g) == np.asarray(w)).all(), name
