"""Device pairing vs oracle + bilinearity (mirrors pairing_test.go:22)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import bls12_381, bn254, point
from gnark_crypto_tpu.pairing import g2_from_ints, pair, pairing_check, pairing_ctx
from gnark_crypto_tpu.towers import PairingOracle
from gnark_crypto_tpu.towers.reference import (
    bls12_381_tower,
    bn254_tower,
    twist_curve,
)

CASES = [("bn254", bn254, bn254_tower), ("bls12_381", bls12_381, bls12_381_tower)]


@pytest.fixture(params=CASES, ids=lambda c: c[0])
def ctx(request):
    name, cs_f, ts_f = request.param
    return pairing_ctx(name), cs_f(), ts_f()


def test_pair_vs_oracle_and_bilinear(ctx):
    tw, cs, ts = ctx
    oracle = PairingOracle(ts)
    tc = twist_curve(ts)
    G1 = cs.generator
    G2 = (ts.g2x, ts.g2y)
    assert tc.is_on_curve(G2)
    a, b = 5, 11
    P2 = cs.ref.mul(a, G1)
    Q2 = tc.mul(b, G2)
    pts_p = [G1, P2, G1]
    pts_q = [G2, Q2, None]
    p_dev = point.affine_from_ints(cs, pts_p)
    q_dev = g2_from_ints(tw, pts_q)
    got = tw.e12_to_oracle(pair(tw, p_dev, q_dev))
    e_base = oracle.pair(G1, G2)
    want0 = e_base
    want1 = oracle.fp12.pow(e_base, a * b)
    assert got[0] == want0, "pairing mismatch vs oracle"
    assert got[1] == want1, "bilinearity failed on device"
    assert got[2] == oracle.fp12.one(), "infinity pair must be 1"


def test_pairing_check(ctx):
    tw, cs, ts = ctx
    tc = twist_curve(ts)
    G1 = cs.generator
    G2 = (ts.g2x, ts.g2y)
    # e(P, Q) * e(-P, Q) == 1
    p_dev = point.affine_from_ints(cs, [G1, cs.ref.neg(G1)])
    q_dev = g2_from_ints(tw, [G2, G2])
    assert bool(np.asarray(pairing_check(tw, p_dev, q_dev)))
    # and a failing check
    p_bad = point.affine_from_ints(cs, [G1, G1])
    assert not bool(np.asarray(pairing_check(tw, p_bad, q_dev)))
