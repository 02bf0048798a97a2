"""Native host-ops library (gnark_crypto_tpu/native) vs the pure-Python path.

The analogue of the reference's asm-vs-purego CI cross-check
(.github/workflows/pr.yml: -tags=purego run), applied to our compiled host
runtime: every native codec/CIOS result must match the big-int reference.
"""

import numpy as np
import pytest

from gnark_crypto_tpu import native
from gnark_crypto_tpu.fields import get_spec, mont


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


FIELDS = ["bn254_fr", "bls12_381_fp", "bw6_761_fp", "babybear", "goldilocks"]


@pytest.mark.parametrize("field", FIELDS)
def test_bytes_roundtrip(lib, field):
    spec = get_spec(field)
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(0, 2**62)) % spec.modulus for _ in range(97)]
    vals[0] = 0
    vals[1] = spec.modulus - 1
    nb = 2 * spec.n_limbs
    data = b"".join(v.to_bytes(nb, "big") for v in vals)
    aos = native.bytes_to_limbs(data, nb, spec.n_limbs)
    for i, v in enumerate(vals):
        assert sum(int(l) << (16 * j) for j, l in enumerate(aos[i])) == v
    back = native.limbs_to_bytes(aos, nb).tobytes()
    assert back == data


@pytest.mark.parametrize("field", FIELDS)
def test_mont_mul_vs_bigint(lib, field):
    spec = get_spec(field)
    q = spec.modulus
    rng = np.random.default_rng(4)
    n = 129
    a = [int(x) % q for x in rng.integers(0, 2**63, n)]
    b = [(int(x) * int(y)) % q for x, y in
         zip(rng.integers(1, 2**63, n), rng.integers(1, 2**63, n))]
    a[0], b[0] = 0, 5
    a[1], b[1] = q - 1, q - 1

    def aos_of(vals):
        out = np.empty((len(vals), spec.n_limbs), dtype=np.uint32)
        for i, v in enumerate(vals):
            out[i] = spec.limbs(v)
        return out

    got = native.mont_mul_batch(spec, aos_of(a), aos_of(b))
    rinv = pow(spec.r, -1, q)
    for i in range(n):
        want = (a[i] * b[i] * rinv) % q
        assert sum(int(l) << (16 * j) for j, l in enumerate(got[i])) == want


def test_mont_mul_broadcast_b(lib):
    spec = get_spec("bn254_fr")
    q = spec.modulus
    a = [7 * i + 1 for i in range(70)]
    aos = np.stack([spec.limbs(v) for v in a]).astype(np.uint32)
    got = native.mont_mul_batch(spec, aos, spec.r2_limbs)  # to_mont
    for i, v in enumerate(a):
        want = (v << (16 * spec.n_limbs)) % q
        assert sum(int(l) << (16 * j) for j, l in enumerate(got[i])) == want


def test_geq_q(lib):
    spec = get_spec("bn254_fr")
    vals = [0, 1, spec.modulus - 1, spec.modulus, spec.modulus + 5]
    aos = np.empty((len(vals), spec.n_limbs), dtype=np.uint32)
    for i, v in enumerate(vals):
        for j in range(spec.n_limbs):
            aos[i, j] = (v >> (16 * j)) & 0xFFFF
    got = native.geq_q_batch(spec, aos)
    assert list(got) == [0, 0, 0, 1, 1]


@pytest.mark.parametrize("field", ["bn254_fr", "bls12_381_fp"])
def test_from_ints_native_matches_fallback(lib, field, monkeypatch):
    spec = get_spec(field)
    rng = np.random.default_rng(5)
    vals = [int(x) for x in rng.integers(0, 2**63, 80)]
    fast = np.asarray(mont.from_ints(spec, vals))
    # force fallback path by shrinking below threshold
    slow_parts = [np.asarray(mont.from_ints(spec, [v])) for v in vals]
    slow = np.concatenate([p.reshape(spec.n_limbs, 1) for p in slow_parts], 1)
    np.testing.assert_array_equal(fast, slow)
    back = mont.to_ints(spec, mont.from_ints(spec, vals))
    assert [int(x) % spec.modulus for x in vals] == [int(x) for x in back]
