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


@pytest.mark.slow
def test_plookup_tables_roundtrip(ctx):
    """Table variant (table.go:52,169): each f column must be a t column."""
    cs, tw, srs = ctx
    q = cs.fr.modulus
    rng = np.random.default_rng(2)
    nb_rows, nb_t = 2, 8
    t = [[int(x) % q for x in rng.integers(0, 2**61, nb_t)]
         for _ in range(nb_rows)]
    # f columns = a selection of t columns
    sel = [int(i) for i in rng.integers(0, nb_t, nb_t - 1)]
    f = [[t[r][j] for j in sel] for r in range(nb_rows)]
    proof = plookup.prove_lookup_tables(cs, tw, srs, f, t)
    assert plookup.verify_lookup_tables(cs, tw, srs, proof)
    # a column outside the table must be rejected at prove time
    f_bad = [list(fr_row) for fr_row in f]
    f_bad[0][0] = (f_bad[0][0] + 1) % q
    with pytest.raises(AssertionError):
        plookup.prove_lookup_tables(cs, tw, srs, f_bad, t)
