"""Property tests for the limbed Montgomery field kernels vs the big-int oracle.

Mirrors the reference's property-test strategy (ecc/bn254/fp/element_test.go:
reduce-below-modulus, inv == exp^(q-2), bytes round-trips, mul-vs-big.Int),
with the pure-Python PF oracle in the math/big role (SURVEY.md §4.1-4.2).
"""

import numpy as np
import pytest

from gnark_crypto_tpu.fields import PF, get_spec, mont

FIELDS = [
    "bn254_fr",
    "bn254_fp",
    "bls12_381_fr",
    "bls12_381_fp",
    "bls12_377_fr",
    "goldilocks",
    "babybear",
    "koalabear",
    "secp256k1_fr",
    "stark_fp",
]
# remaining registry fields: same op surface, wider limb counts — slow tier
# (the property matrix covers EVERY field, mirroring the reference's
# per-field element_test.go stamping; ecc/bn254/fp/element_test.go:224+)
FIELDS_SLOW = [
    "bls12_377_fp",
    "bw6_761_fp",
    "bw6_761_fr",
    "bw6_633_fp",
    "bw6_633_fr",
    "bls24_315_fp",
    "bls24_315_fr",
    "bls24_317_fp",
    "bls24_317_fr",
    "secp256k1_fp",
    "stark_fr",
]

N = 64


def rand_ints(spec, rng, n=N):
    # include edge cases: 0, 1, q-1, q-2, small, near-q
    edge = [0, 1, 2, spec.modulus - 1, spec.modulus - 2, spec.r % spec.modulus]
    vals = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % spec.modulus
            for _ in range(n - len(edge))]
    return edge + vals


@pytest.fixture(params=FIELDS + [
    pytest.param(f, marks=pytest.mark.slow) for f in FIELDS_SLOW
])
def fld(request):
    spec = get_spec(request.param)
    return spec, PF(spec.modulus)


def test_roundtrip(fld):
    spec, _ = fld
    rng = np.random.default_rng(0)
    vals = rand_ints(spec, rng)
    a = mont.from_ints(spec, vals)
    back = mont.to_ints(spec, a)
    assert [int(x) for x in back] == [v % spec.modulus for v in vals]


def test_add_sub_neg(fld):
    spec, pf = fld
    rng = np.random.default_rng(1)
    va, vb = rand_ints(spec, rng), rand_ints(spec, rng)
    a, b = mont.from_ints(spec, va), mont.from_ints(spec, vb)
    got_add = mont.to_ints(spec, mont.add(spec, a, b))
    got_sub = mont.to_ints(spec, mont.sub(spec, a, b))
    got_neg = mont.to_ints(spec, mont.neg(spec, a))
    for i, (x, y) in enumerate(zip(va, vb)):
        assert int(got_add[i]) == pf.add(x, y)
        assert int(got_sub[i]) == pf.sub(x, y)
        assert int(got_neg[i]) == pf.neg(x)


def test_mul_square(fld):
    spec, pf = fld
    rng = np.random.default_rng(2)
    va, vb = rand_ints(spec, rng), rand_ints(spec, rng)
    a, b = mont.from_ints(spec, va), mont.from_ints(spec, vb)
    got_mul = mont.to_ints(spec, mont.mul(spec, a, b))
    got_sq = mont.to_ints(spec, mont.square(spec, a))
    for i, (x, y) in enumerate(zip(va, vb)):
        assert int(got_mul[i]) == pf.mul(x, y), f"mul mismatch at {i}"
        assert int(got_sq[i]) == pf.square(x)


def test_inverse(fld):
    spec, pf = fld
    rng = np.random.default_rng(3)
    va = rand_ints(spec, rng, 16)
    a = mont.from_ints(spec, va)
    got = mont.to_ints(spec, mont.inverse(spec, a))
    for i, x in enumerate(va):
        assert int(got[i]) == pf.inv(x)


def test_batch_inverse(fld):
    spec, pf = fld
    rng = np.random.default_rng(4)
    va = rand_ints(spec, rng, 32)
    va[5] = 0  # zero passes through
    a = mont.from_ints(spec, va)
    got = mont.to_ints(spec, mont.batch_inverse(spec, a, axis=1))
    for i, x in enumerate(va):
        assert int(got[i]) == pf.inv(x), f"batch inv mismatch at {i}"


def test_pow_exp(fld):
    spec, pf = fld
    rng = np.random.default_rng(5)
    va = rand_ints(spec, rng, 8)
    a = mont.from_ints(spec, va)
    for e in [0, 1, 2, 3, 65537, spec.modulus // 3]:
        got = mont.to_ints(spec, mont.pow_const(spec, a, e))
        for i, x in enumerate(va):
            assert int(got[i]) == pf.exp(x, e), f"exp {e} mismatch at {i}"


def test_legendre_sqrt(fld):
    spec, pf = fld
    rng = np.random.default_rng(6)
    va = rand_ints(spec, rng, 16)
    a = mont.from_ints(spec, va)
    leg = np.asarray(mont.legendre(spec, a))
    root, ok = mont.sqrt(spec, a)
    root_i = mont.to_ints(spec, root)
    ok = np.asarray(ok)
    for i, x in enumerate(va):
        assert int(leg[i]) == pf.legendre(x)
        expect = pf.sqrt(x)
        if expect is None:
            assert not ok[i]
        else:
            assert ok[i]
            r = int(root_i[i])
            assert r == expect or r == spec.modulus - expect, f"sqrt mismatch at {i}"


def test_mul_const_and_double(fld):
    spec, pf = fld
    rng = np.random.default_rng(7)
    va = rand_ints(spec, rng, 8)
    a = mont.from_ints(spec, va)
    for k in [0, 1, 2, 3, 4, 11]:
        got = mont.to_ints(spec, mont.mul_const(spec, a, k))
        for i, x in enumerate(va):
            assert int(got[i]) == pf.mul(x, k)


def test_limbs_reduced_below_modulus(fld):
    """Every op's output limbs decode to a canonical residue < q (the
    reduce-below-modulus property matrix, element_test.go:276)."""
    spec, _ = fld
    rng = np.random.default_rng(8)
    va, vb = rand_ints(spec, rng, 16), rand_ints(spec, rng, 16)
    a, b = mont.from_ints(spec, va), mont.from_ints(spec, vb)
    outs = {
        "add": mont.add(spec, a, b),
        "sub": mont.sub(spec, a, b),
        "neg": mont.neg(spec, a),
        "mul": mont.mul(spec, a, b),
        "square": mont.square(spec, a),
        "double": mont.double(spec, a),
    }
    from gnark_crypto_tpu.fields.spec import limbs_to_int

    for name, o in outs.items():
        host = np.asarray(o)
        for i in range(host.shape[1]):
            v = limbs_to_int(host[:, i])
            assert v < spec.modulus, f"{name} output not reduced at {i}"


def test_algebraic_identities(fld):
    """Commutativity / associativity / distributivity on random samples
    (the gopter property style of element_test.go:224+)."""
    spec, _ = fld
    rng = np.random.default_rng(9)
    va, vb, vc = (rand_ints(spec, rng, 16) for _ in range(3))
    a, b, c = (mont.from_ints(spec, v) for v in (va, vb, vc))
    lhs = mont.mul(spec, a, mont.add(spec, b, c))
    rhs = mont.add(spec, mont.mul(spec, a, b), mont.mul(spec, a, c))
    assert bool(np.asarray(mont.eq(spec, lhs, rhs)).all())
    assert bool(np.asarray(mont.eq(spec, mont.mul(spec, a, b),
                                   mont.mul(spec, b, a))).all())
    ab_c = mont.mul(spec, mont.mul(spec, a, b), c)
    a_bc = mont.mul(spec, a, mont.mul(spec, b, c))
    assert bool(np.asarray(mont.eq(spec, ab_c, a_bc)).all())


def test_inv_equals_exp(fld):
    """inv(x) == x^(q-2) (element_test.go:482) and inv(inv(x)) == x."""
    spec, _ = fld
    rng = np.random.default_rng(10)
    va = rand_ints(spec, rng, 8)
    a = mont.from_ints(spec, va)
    inv = mont.inverse(spec, a)
    byexp = mont.pow_const(spec, a, spec.modulus - 2)
    assert bool(np.asarray(mont.eq(spec, inv, byexp)).all())
    nz = [v if v != 0 else 1 for v in va]
    a2 = mont.from_ints(spec, nz)
    back = mont.inverse(spec, mont.inverse(spec, a2))
    assert bool(np.asarray(mont.eq(spec, back, a2)).all())


def test_select_eq_is_zero(fld):
    spec, _ = fld
    rng = np.random.default_rng(11)
    va = rand_ints(spec, rng, 16)
    a = mont.from_ints(spec, va)
    z = mont.zeros(spec, (16,))
    iz = np.asarray(mont.is_zero(spec, a))
    for i, v in enumerate(va):
        assert bool(iz[i]) == (v == 0)
    sel = mont.select(mont.is_zero(spec, a), mont.one(spec, (16,)), a)
    got = mont.to_ints(spec, sel)
    for i, v in enumerate(va):
        assert int(got[i]) == (1 if v == 0 else v)
    assert bool(np.asarray(mont.eq(spec, z, mont.zeros(spec, (16,)))).all())


def test_sum_and_inner_product(fld):
    """Vector reductions vs host (vector.go:29 Sum / InnerProduct)."""
    spec, pf = fld
    rng = np.random.default_rng(12)
    va, vb = rand_ints(spec, rng, 17), rand_ints(spec, rng, 17)
    a, b = mont.from_ints(spec, va), mont.from_ints(spec, vb)
    s = mont.to_ints(spec, mont.sum_axis(spec, a, axis=1)[:, None])[0]
    assert int(s) == sum(va) % spec.modulus
    ip = mont.to_ints(spec, mont.inner_product(spec, a, b, axis=1)[:, None])[0]
    assert int(ip) == sum(x * y for x, y in zip(va, vb)) % spec.modulus
