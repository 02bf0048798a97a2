"""Plookup roundtrip (mirrors fr/plookup tests)."""

import numpy as np
import pytest

from gnark_crypto_tpu.commit import kzg
from gnark_crypto_tpu.curves import bn254
from gnark_crypto_tpu.pairing import pairing_ctx
from gnark_crypto_tpu.protocols import plookup


@pytest.fixture(scope="module")
def ctx():
    cs = bn254()
    tw = pairing_ctx("bn254")
    srs = kzg.new_srs(cs, tw, 64, tau=192837465564738291)
    return cs, tw, srs


def test_plookup_roundtrip(ctx):
    cs, tw, srs = ctx
    rng = np.random.default_rng(0)
    n = 8
    t = sorted(int(x) % cs.fr.modulus for x in rng.integers(0, 2**61, n))
    f = [t[int(i)] for i in rng.integers(0, n, n - 1)]
    proof = plookup.prove(cs, tw, srs, f, t)
    assert plookup.verify(cs, tw, srs, proof)
    # tampering with an opening must fail
    proof.openings["F"] = (proof.openings["F"] + 1) % cs.fr.modulus
    assert not plookup.verify(cs, tw, srs, proof)


def test_plookup_rejects_bad_witness(ctx):
    cs, tw, srs = ctx
    rng = np.random.default_rng(1)
    n = 8
    t = sorted(int(x) % cs.fr.modulus for x in rng.integers(0, 2**61, n))
    f = [t[0]] * (n - 2) + [(t[0] + 1) % cs.fr.modulus]  # not in table
    with pytest.raises(AssertionError):
        plookup.prove(cs, tw, srs, f, t)
