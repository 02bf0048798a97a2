"""KZG commit/open/verify end-to-end (mirrors kzg_test.go), small SRS on CPU."""

import numpy as np
import pytest

from gnark_crypto_tpu.commit import kzg
from gnark_crypto_tpu.curves import bn254, point
from gnark_crypto_tpu.fields import mont
from gnark_crypto_tpu.pairing import pairing_ctx


@pytest.fixture(scope="module")
def setup():
    cs = bn254()
    tw = pairing_ctx("bn254")
    srs = kzg.new_srs(cs, tw, 32, tau=1234567891011)
    return cs, tw, srs


def rand_poly(cs, n, seed):
    rng = np.random.default_rng(seed)
    coeffs = [int(rng.integers(0, 2**62)) % cs.fr.modulus for _ in range(n)]
    return coeffs, mont.from_ints(cs.fr, coeffs)


def test_srs_consistency(setup):
    cs, tw, srs = setup
    # pk.g1[i] must equal tau^i * G (host oracle)
    got = point.affine_to_ints(cs, srs.pk.g1)
    tau = 1234567891011
    t = 1
    for i in range(4):
        assert got[i] == cs.ref.mul(t, cs.generator)
        t = t * tau % cs.fr.modulus


def test_commit_matches_oracle_msm(setup):
    cs, tw, srs = setup
    coeffs, poly = rand_poly(cs, 16, 0)
    c = kzg.commit(cs, srs.pk, poly)
    got = kzg._to_host_point(cs, c)
    pk_pts = list(point.affine_to_ints(cs, srs.pk.g1))[:16]
    want = cs.ref.msm(coeffs, pk_pts)
    assert got == want


def test_open_verify_roundtrip(setup):
    cs, tw, srs = setup
    coeffs, poly = rand_poly(cs, 32, 1)
    c_host = kzg._to_host_point(cs, kzg.commit(cs, srs.pk, poly))
    a = 987654321987654321
    proof = kzg.open_(cs, srs.pk, poly, a)
    # claimed value correct?
    want_y = sum(c * pow(a, i, cs.fr.modulus) for i, c in enumerate(coeffs)) % cs.fr.modulus
    assert proof.claimed_value == want_y
    assert kzg.verify(tw, cs, srs.vk, c_host, proof, a)
    # tampered claimed value must fail
    bad = kzg.OpeningProof(h=proof.h, claimed_value=(want_y + 1) % cs.fr.modulus)
    assert not kzg.verify(tw, cs, srs.vk, c_host, bad, a)


def test_batch_open_verify(setup):
    cs, tw, srs = setup
    polys = []
    digests = []
    for s in range(3):
        _, p = rand_poly(cs, 16 + 4 * s, 10 + s)
        polys.append(p)
        digests.append(kzg._to_host_point(cs, kzg.commit(cs, srs.pk, p)))
    a = 31415926535
    proof = kzg.batch_open_single_point(cs, srs.pk, polys, a, digests)
    assert kzg.batch_verify_single_point(tw, cs, srs.vk, digests, proof, a)
    bad = kzg.BatchOpeningProof(
        h=proof.h,
        claimed_values=[(proof.claimed_values[0] + 1) % cs.fr.modulus]
        + proof.claimed_values[1:],
    )
    assert not kzg.batch_verify_single_point(tw, cs, srs.vk, digests, bad, a)


def test_fold_proof_and_multi_points(setup):
    """FoldProof (kzg.go:341) + BatchVerifyMultiPoints (kzg.go:405)."""
    cs, tw, srs = setup
    polys = [rand_poly(cs, 16, s)[1] for s in (10, 11)]
    digests = [kzg._to_host_point(cs, kzg.commit(cs, srs.pk, p)) for p in polys]
    a = 555
    bproof = kzg.batch_open_single_point(cs, srs.pk, polys, a, digests)
    folded_proof, folded_digest = kzg.fold_proof(cs, digests, bproof, a)
    assert kzg.verify(tw, cs, srs.vk, folded_digest, folded_proof, a)

    # multi-point: independent openings at different points, one pairing
    pts = [77, 99]
    proofs = [kzg.open_(cs, srs.pk, p, x) for p, x in zip(polys, pts)]
    rng = np.random.default_rng(3)
    ok = kzg.batch_verify_multi_points(tw, cs, srs.vk, digests, proofs, pts, rng)
    assert ok
    bad = kzg.OpeningProof(
        h=proofs[1].h,
        claimed_value=(proofs[1].claimed_value + 1) % cs.fr.modulus,
    )
    rng = np.random.default_rng(3)
    assert not kzg.batch_verify_multi_points(
        tw, cs, srs.vk, digests, [proofs[0], bad], pts, rng)
