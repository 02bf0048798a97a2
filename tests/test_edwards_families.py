"""All twisted-Edwards companion curves (one per SNARK curve + Bandersnatch)
and the stark-curve Pedersen hash.

Reference params: internal/generator/config/{bn254,bls12-381,...}.go
twisted-Edwards blocks; Pedersen vectors:
ecc/stark-curve/pedersen-hash/pedersen_hash_test.go."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves.edwards import (
    EDWARDS_CURVES,
    EdOracle,
    ed_add,
    ed_from_affine,
    ed_from_ints,
    ed_scalar_mul,
    ed_to_affine,
    ed_to_ints,
)
from gnark_crypto_tpu.fields import mont


@pytest.mark.parametrize("name", sorted(EDWARDS_CURVES))
def test_edwards_device_matches_oracle(name):
    es = EDWARDS_CURVES[name]()
    o = EdOracle(es)
    G = (es.bx, es.by)
    pts = [o.mul(k, G) for k in (1, 7, 2**64 + 3)]
    dev = ed_from_affine(es, ed_from_ints(es, pts))
    got = ed_to_ints(es, ed_to_affine(es, ed_add(es, dev, dev)))
    assert list(got) == [o.add(p, p) for p in pts]

    ks = [0, 3, es.order - 1]
    s = mont.from_ints(es.fr, ks, mont=False)
    got = ed_to_ints(es, ed_to_affine(es, ed_scalar_mul(es, dev, s)))
    assert list(got) == [o.mul(k, p) for k, p in zip(ks, pts)]


def test_bandersnatch_params():
    es = EDWARDS_CURVES["bandersnatch"]()
    assert not es.complete  # a = -5 is a non-square mod fr381
    assert es.cofactor == 4


# ---- stark Pedersen hash ----------------------------------------------------

# pedersen_hash_test.go:15-26 vectors (StarkWare fast_pedersen_hash)
PEDERSEN_VECTORS = [
    (
        0x03D937C035C878245CAF64531A5756109C53068DA139362728FEB561405371CB,
        0x0208A0A10250E382E1E4BBE2880906C2791BF6275695E02FBBC6AEFF9CD8B31A,
        0x030E480BED5FE53FA909CC0F8C4D99B8F9F2C016BE4C41E13A4848797979C662,
    ),
    (
        0x58F580910A6CA59B28927C08FE6C43E2E303CA384BADC365795FC645D479D45,
        0x78734F65A067BE9BDB39DE18434D71E79F7B6466A4B66BBD979AB9E7515FE0B,
        0x68CC0B76CDDD1DD4ED2301ADA9B7C872B23875D5FF837B3A87993E0D9996B87,
    ),
]


def test_pedersen_hash_vectors():
    from gnark_crypto_tpu.hashes.pedersen_hash import _host_oracle, pedersen_ints

    h = _host_oracle()
    for a, b, want in PEDERSEN_VECTORS:
        assert h(a, b) == want
    got = pedersen_ints([(a, b) for a, b, _ in PEDERSEN_VECTORS])
    assert [int(x) for x in got] == [v[2] for v in PEDERSEN_VECTORS]


def test_pedersen_array():
    from gnark_crypto_tpu.hashes.pedersen_hash import _host_oracle, pedersen_array

    # PedersenArray(e...) = fold Pedersen from 0, then hash in the length
    h = _host_oracle()
    elems = [314, 159, 265]
    want = h(h(h(h(0, 314), 159), 265), 3)
    assert pedersen_array(elems) == want
