"""Pedersen / SHPLONK / FFLONK / FRI / permutation / mpcsetup / marshal tests
(roundtrip + tamper-rejection, mirroring the reference's *_test.go style)."""

import numpy as np
import pytest

from gnark_crypto_tpu.commit import fflonk, fri, kzg, pedersen, shplonk
from gnark_crypto_tpu.curves import bn254, point
from gnark_crypto_tpu.curves.marshal import g1_from_bytes, g1_to_bytes
from gnark_crypto_tpu.fields import get_spec, mont
from gnark_crypto_tpu.pairing import pairing_ctx
from gnark_crypto_tpu.protocols import mpcsetup, permutation
from gnark_crypto_tpu import registry


@pytest.fixture(scope="module")
def ctx():
    cs = bn254()
    tw = pairing_ctx("bn254")
    srs = kzg.new_srs(cs, tw, 32, tau=987654321123456789)
    return cs, tw, srs


def rand_poly(cs, n, seed):
    rng = np.random.default_rng(seed)
    return mont.from_ints(
        cs.fr, [int(x) % cs.fr.modulus for x in rng.integers(0, 2**62, n)]
    )


def test_pedersen(ctx):
    cs, tw, _ = ctx
    rng = np.random.default_rng(0)
    bases = [cs.ref.mul(int(k), cs.generator) for k in rng.integers(1, 2**60, 8)]
    pk, vk = pedersen.setup(cs, tw, bases, sigma=13371337)
    values = rand_poly(cs, 8, 1)
    com = pedersen.commit(cs, pk, values)
    pok = pedersen.prove_knowledge(cs, pk, values)
    assert pedersen.verify(tw, cs, vk, com, pok)
    bad = cs.ref.add(pok, cs.generator)
    assert not pedersen.verify(tw, cs, vk, com, bad)


def test_shplonk(ctx):
    cs, tw, srs = ctx
    polys = [rand_poly(cs, 16, 2), rand_poly(cs, 12, 3)]
    digests = [kzg._to_host_point(cs, kzg.commit(cs, srs.pk, p)) for p in polys]
    sets = [[3, 5], [5, 11]]
    proof = shplonk.batch_open(cs, srs.pk, polys, sets, digests)
    assert shplonk.batch_verify(tw, cs, srs.vk, digests, sets, proof)
    bad = shplonk.ShplonkProof(
        w=proof.w, w_prime=proof.w_prime,
        claimed_values=[[(proof.claimed_values[0][0] + 1) % cs.fr.modulus]
                        + proof.claimed_values[0][1:], proof.claimed_values[1]],
    )
    assert not shplonk.batch_verify(tw, cs, srs.vk, digests, sets, bad)


def test_fflonk(ctx):
    cs, tw, srs = ctx
    polys = [rand_poly(cs, 8, 4), rand_poly(cs, 8, 5)]
    folded = fflonk.fold(cs, polys)
    digest = kzg._to_host_point(cs, kzg.commit(cs, srs.pk, folded))
    # point must be a t-th power residue: use x^2
    x = 12345
    pointv = pow(x, 2, cs.fr.modulus)
    proof = fflonk.batch_open(cs, srs.pk, polys, pointv, digest)
    assert fflonk.batch_verify(tw, cs, srs.vk, digest, pointv, proof)


def test_fri():
    spec = get_spec("bn254_fr")
    iopp = fri.Iopp(spec, size=16, rho=4, nb_queries=4)
    rng = np.random.default_rng(6)
    coeffs = mont.from_ints(
        spec, [int(x) % spec.modulus for x in rng.integers(0, 2**62, 16)]
    )
    proof = iopp.build_proof(coeffs)
    assert iopp.verify_proof(proof)
    # tamper with final values
    bad = fri.FriProof(roots=proof.roots,
                       final_poly=[(proof.final_poly[0] + 1) % spec.modulus]
                       + proof.final_poly[1:],
                       queries=proof.queries)
    assert not iopp.verify_proof(bad)


def test_permutation(ctx):
    cs, tw, srs = ctx
    rng = np.random.default_rng(7)
    n = 8
    sigma = list(rng.permutation(n))
    t1 = [int(x) % cs.fr.modulus for x in rng.integers(0, 2**62, n)]
    proof, _ = permutation.prove(cs, tw, srs, sigma, t1)
    assert permutation.verify(cs, tw, srs, proof)
    # tampering with an opening must fail
    proof.openings_z["A"] = (proof.openings_z["A"] + 1) % cs.fr.modulus
    assert not permutation.verify(cs, tw, srs, proof)


def test_mpcsetup(ctx):
    cs, tw, _ = ctx
    state = mpcsetup.initialize(cs, tw, size=6)
    state = mpcsetup.contribute(cs, tw, state, x=111111, nonce=5)
    assert mpcsetup.verify(cs, tw, state)
    state2 = mpcsetup.contribute(cs, tw, state, x=222222, nonce=9)
    assert mpcsetup.verify(cs, tw, state2)
    # a corrupted power must fail verification
    bad = mpcsetup.SetupState(
        g1_powers=state2.g1_powers[:3]
        + [cs.ref.add(state2.g1_powers[3], cs.generator)]
        + state2.g1_powers[4:],
        tau_g2=state2.tau_g2, x_g1=state2.x_g1, x_g2=state2.x_g2,
        pok=state2.pok,
    )
    assert not mpcsetup.verify(cs, tw, bad)
    # final tau must equal product of contributions
    tau = 111111 * 222222 % cs.fr.modulus
    assert state2.g1_powers[1] == cs.ref.mul(tau, cs.generator)


def test_marshal_roundtrip(ctx):
    cs, _, _ = ctx
    rng = np.random.default_rng(8)
    pts = [cs.ref.mul(int(k), cs.generator) for k in rng.integers(1, 2**60, 4)]
    pts.append(None)
    for P in pts:
        for raw in (False, True):
            data = g1_to_bytes(cs, P, raw=raw)
            assert len(data) == (2 * cs.fp.bytes if raw else cs.fp.bytes)
            back = g1_from_bytes(cs, data)
            assert back == P


def test_registry():
    assert registry.ID.BN254 in registry.implemented()
    assert registry.scalar_field(registry.ID.BN254) == bn254().fr.modulus
    h = registry.new_hash("MIMC_BN254_FR")
    assert h.rounds == 110
    assert registry.signature_scheme("EDDSA") is not None


def test_fri_index_maps():
    """sorted<->canonical index surface (fri.go:201-248)."""
    from gnark_crypto_tpu.commit.fri import Iopp
    from gnark_crypto_tpu.fields import get_spec

    n = 16
    # sort_evals puts canonical i and i+n/2 adjacent; convert_canonical_sorted
    # must give each canonical index its sorted position
    evals = list(range(n))
    sorted_e = Iopp.sort_evals(evals)
    for i in range(n):
        assert sorted_e[Iopp.convert_canonical_sorted(i, n)] == evals[i], i
