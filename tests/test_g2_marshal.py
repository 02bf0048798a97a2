"""G2 serialization (marshal.go:1023+ conventions).

The bls12-381 G2 generator compressed encoding is pinned to the standard
(zcash BLS12-381 ciphersuite) byte string, which gnark-crypto also produces;
other cases are round-trips through the host curve oracle."""

import pytest

from gnark_crypto_tpu.curves import marshal
from gnark_crypto_tpu.curves.g2 import g2_group

# canonical compressed bls12-381 G2 generator (zcash serialization spec)
BLS12_381_G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_bls12_381_g2_generator_bytes():
    g = g2_group("bls12_381")
    gen = (g._h(g.gx), g._h(g.gy))
    assert marshal.g2_to_bytes(g, gen) == BLS12_381_G2_GEN_COMPRESSED
    back = marshal.g2_from_bytes(g, BLS12_381_G2_GEN_COMPRESSED)
    assert back == gen


@pytest.mark.parametrize("curve", ["bn254", "bls12_381", "bls12_377"])
def test_g2_roundtrip(curve):
    g = g2_group(curve)
    hc = g.host_curve
    gen = (g._h(g.gx), g._h(g.gy))
    for k in (1, 2, 5, 123456789):
        P = hc.mul(k, gen)
        for raw in (False, True):
            data = marshal.g2_to_bytes(g, P, raw=raw)
            assert len(data) == (4 if raw else 2) * g.ops.spec.bytes
            back = marshal.g2_from_bytes(g, data)
            assert back == P, (curve, k, raw)
    # infinity encodings
    for raw in (False, True):
        data = marshal.g2_to_bytes(g, None, raw=raw)
        assert marshal.g2_from_bytes(g, data) is None


def test_g2_rejects_bad_points():
    g = g2_group("bls12_381")
    gen = (g._h(g.gx), g._h(g.gy))
    data = bytearray(marshal.g2_to_bytes(g, gen))
    data[5] ^= 0xFF
    with pytest.raises(ValueError):
        marshal.g2_from_bytes(g, bytes(data))
