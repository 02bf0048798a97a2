"""Fixed-Q pairing (pairing/lines.py) vs the generic stack Miller loop.

The precomputed-line Miller loop must agree with the generic one for any
fixed Q (PairFixedQ / PrecomputeLines, ecc/bn254/pairing.go:26-457), and
KZG verification through the fixed-Q fold must accept honest proofs and
reject tampered ones."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import bn254, bls12_381, point
from gnark_crypto_tpu.curves import group as grp
from gnark_crypto_tpu.curves.g2 import g2_group
from gnark_crypto_tpu.pairing import ate, lines as fl
from gnark_crypto_tpu.towers.host import HostCurve

CASES = ["bn254", "bls12_381"]


@pytest.mark.parametrize("name", CASES)
def test_fixed_q_check_matches_generic(name):
    st = ate.pairing_stack(name)
    cs = bn254() if name == "bn254" else bls12_381()
    h = st.host_tf
    b = st.b_twist if not isinstance(st.b_twist, int) else h.embed(st.b_twist)
    hc = HostCurve(h, b)
    gx, gy = st.g2_gen
    if isinstance(gx, int):
        gx, gy = h.embed(gx), h.embed(gy)
    Q1 = (gx, gy)
    Q2 = hc.mul(7, Q1)
    G1 = cs.generator
    P1 = cs.ref.mul(13, G1)
    P2 = cs.ref.mul(91, cs.ref.neg(G1))  # e(13G,7G2)*e(-91G,G2_g)... build a
    # true product-one instance instead: e(aG1, bG2) * e(-abG1, G2) == 1
    P1 = cs.ref.mul(13, G1)
    P2 = cs.ref.neg(cs.ref.mul(13 * 7, G1))
    lines = fl.stack_lines([
        fl.precompute_lines(st, Q2),   # pairs with P1: e(13G, 7G2)
        fl.precompute_lines(st, Q1),   # pairs with P2: e(-91G, G2)
    ])
    p_dev = point.affine_from_ints(cs, [P1, P2])
    ok = bool(np.asarray(fl.pairing_check_fixed(st, p_dev, lines)))
    assert ok, "fixed-Q product-one check failed"
    # and the same with a wrong P must fail
    p_bad = point.affine_from_ints(cs, [P1, cs.ref.mul(5, G1)])
    assert not bool(np.asarray(fl.pairing_check_fixed(st, p_bad, lines)))


def test_kzg_verify_fixed_q_roundtrip():
    import dataclasses

    from gnark_crypto_tpu import registry
    from gnark_crypto_tpu.commit import kzg
    from gnark_crypto_tpu.fields import mont
    from gnark_crypto_tpu.registry import ID

    cs = bn254()
    tw = registry.pairing_tower(ID.BN254)
    srs = registry.new_srs(ID.BN254, size=8, tau=1122334455)
    q = cs.fr.modulus
    coeffs = [2, 7, 1, 8, 2, 8]
    poly = mont.from_ints(cs.fr, coeffs)
    C = kzg.commit(cs, srs.pk, poly)
    a = 31337
    pr = kzg.open_(cs, srs.pk, poly, a)
    Ch = kzg.digest(cs, C)
    assert kzg._fixed_q_ctx(cs.name) is not None  # fixed-Q path active
    assert kzg.verify(tw, cs, srs.vk, Ch, pr, a)
    bad = dataclasses.replace(pr, claimed_value=(pr.claimed_value + 1) % q)
    assert not kzg.verify(tw, cs, srs.vk, Ch, bad, a)
