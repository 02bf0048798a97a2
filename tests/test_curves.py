"""Curve group-law tests vs the Python affine oracle (mirrors g1_test.go's
property style: ops vs big.Int scalar arithmetic, conversions, edge cases)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import bls12_381, bn254, point, secp256k1, stark_curve

CURVES = [bn254, bls12_381, secp256k1, stark_curve]


@pytest.fixture(params=CURVES, ids=lambda c: c().name)
def cs(request):
    return request.param()


def ref_points(cs, n, seed=0):
    rng = np.random.default_rng(seed)
    G = cs.generator
    pts = []
    for _ in range(n):
        k = int(rng.integers(1, 2**62))
        pts.append(cs.ref.mul(k, G))
    return pts


def test_affine_roundtrip_and_on_curve(cs):
    pts = ref_points(cs, 4) + [None]
    a = point.affine_from_ints(cs, pts)
    assert np.asarray(point.is_on_curve_affine(cs, a)).all()
    back = point.affine_to_ints(cs, a)
    assert list(back) == pts


def test_add_double_vs_oracle(cs):
    pts_p = ref_points(cs, 6, 1)
    pts_q = ref_points(cs, 6, 2)
    # edge cases: equal points (doubling), inverse points, infinity
    pts_p[3] = pts_q[3]                      # P == Q -> double
    pts_q[4] = cs.ref.neg(pts_p[4])          # P == -Q -> infinity
    pts_p[5] = None                          # inf + Q -> Q
    P = point.jac_from_affine(cs, point.affine_from_ints(cs, pts_p))
    Q = point.jac_from_affine(cs, point.affine_from_ints(cs, pts_q))
    got = point.affine_to_ints(cs, point.jac_to_affine(cs, point.jac_add(cs, P, Q)))
    want = [cs.ref.add(p, q) for p, q in zip(pts_p, pts_q)]
    assert list(got) == want

    got_d = point.affine_to_ints(cs, point.jac_to_affine(cs, point.jac_double(cs, P)))
    want_d = [cs.ref.double(p) for p in pts_p]
    assert list(got_d) == want_d


def test_mixed_add_vs_oracle(cs):
    pts_p = ref_points(cs, 6, 3)
    pts_q = ref_points(cs, 6, 4)
    pts_p[3] = pts_q[3]
    pts_q[4] = cs.ref.neg(pts_p[4])
    pts_q[5] = None
    P = point.jac_from_affine(cs, point.affine_from_ints(cs, pts_p))
    Q = point.affine_from_ints(cs, pts_q)
    got = point.affine_to_ints(
        cs, point.jac_to_affine(cs, point.jac_add_mixed(cs, P, Q))
    )
    want = [cs.ref.add(p, q) for p, q in zip(pts_p, pts_q)]
    assert list(got) == want


def test_scalar_mul_vs_oracle(cs):
    rng = np.random.default_rng(5)
    n = 4
    pts = ref_points(cs, n, 6)
    scalars = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % cs.fr.modulus
               for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    got = point.affine_to_ints(cs, point.jac_to_affine(cs, point.scalar_mul(cs, base, s)))
    want = [cs.ref.mul(k, p) for k, p in zip(scalars, pts)]
    assert list(got) == want


def test_glv_constants(cs):
    if not cs.has_glv:
        pytest.skip("no GLV")
    lam, beta = cs.glv
    G = cs.generator
    assert cs.ref.mul(lam, G) == (G[0] * beta % cs.fp.modulus, G[1])
