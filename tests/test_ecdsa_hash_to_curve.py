"""ECDSA tests + hash-to-curve RFC 9380 vectors.

Hash-to-curve vectors from the reference's ecc/bn254/hash_vectors_test.go
(RFC 9380 suite BN254G1_XMD:SHA-256_SVDW_RO_/NU_)."""

import numpy as np

from gnark_crypto_tpu.curves import bn254, secp256k1
from gnark_crypto_tpu.curves.hash_to_curve import encode_to_g1, hash_to_g1, svdw_constants
from gnark_crypto_tpu.hashes.hash_to_field import hash_to_field
from gnark_crypto_tpu.signatures import ecdsa


def test_ecdsa_sign_verify():
    for cs_f in (bn254, secp256k1):
        cs = cs_f()
        priv = ecdsa.generate_key(cs, b"\x05" * 32)
        msg_hash = np.random.default_rng(0).bytes(32)
        sig = ecdsa.sign(cs, priv, msg_hash)
        assert ecdsa.verify(cs, priv.public, sig, msg_hash)
        bad = ecdsa.Signature(r=sig.r, s=(sig.s + 1) % cs.fr.modulus)
        assert not ecdsa.verify(cs, priv.public, bad, msg_hash)


def test_ecdsa_batch_verify_device():
    cs = bn254()
    privs = [ecdsa.generate_key(cs, bytes([i]) * 16) for i in range(1, 4)]
    hashes = [bytes([i]) * 32 for i in range(3)]
    sigs = [ecdsa.sign(cs, p, h) for p, h in zip(privs, hashes)]
    ok = ecdsa.batch_verify(cs, [p.public for p in privs], sigs, hashes)
    assert ok.all()
    sigs[2] = ecdsa.Signature(r=sigs[2].r, s=(sigs[2].s + 1) % cs.fr.modulus)
    ok = ecdsa.batch_verify(cs, [p.public for p in privs], sigs, hashes)
    assert ok[0] and ok[1] and not ok[2]


def test_svdw_constants_match_reference_config():
    # internal/generator/config/bn254.go HashE1: z=1, c1=4, c2=..., c3=..., c4=...
    k = svdw_constants("bn254")
    assert k.z == 1
    assert k.c1 == 4
    assert k.c2 == 10944121435919637611123202872628637544348155578648911831344518947322613104291
    assert k.c3 == 8815841940592487685674414971303048083897117035520822607866
    assert k.c4 == 7296080957279758407415468581752425029565437052432607887563012631548408736189


# RFC 9380 vectors (ecc/bn254/hash_vectors_test.go)
_DST_RO = b"QUUX-V01-CS02-with-BN254G1_XMD:SHA-256_SVDW_RO_"
_DST_NU = b"QUUX-V01-CS02-with-BN254G1_XMD:SHA-256_SVDW_NU_"


def test_hash_to_field_vectors():
    cs = bn254()
    us = hash_to_field(b"", _DST_RO, cs.fp.modulus, 2)
    assert us[0] == 0x2F87B81D9D6EF05AD4D249737498CC27E1BD485DCA804487844FEB3C67C1A9B5
    assert us[1] == 0x6DE2D0D7C0D9C7A5A6C0B74675E7543F5B98186B5DBF831067449000B2B1F8E


def test_encode_to_g1_vectors():
    cs = bn254()
    P = encode_to_g1(cs, b"", _DST_NU)
    assert P == (
        0x1BB8810E2CEAF04786D4EFD216FC2820DDD9363712EFC736ADA11049D8AF5925,
        0x1EFBF8D54C60D865CCE08437668EA30F5BF90D287DBD9B5AF31DA852915E8F11,
    )
    P = encode_to_g1(cs, b"abc", _DST_NU)
    assert P == (
        0xDA4A96147DF1F35B0F820BD35C6FAC3B80E8E320DE7C536B1E054667B22C332,
        0x189BD3FBFFE4C8740D6543754D95C790E44CD2D162858E3B733D2B8387983BB7,
    )


def test_hash_to_g1_vectors():
    cs = bn254()
    P = hash_to_g1(cs, b"", _DST_RO)
    assert P == (
        0xA976AB906170DB1F9638D376514DBF8C42AEF256A54BBD48521F20749E59E86,
        0x2925EAD66B9E68BFC309B014398640AB55F6619AB59BC1FAB2210AD4C4D53D5,
    )
    P = hash_to_g1(cs, b"abc", _DST_RO)
    assert P == (
        0x23F717BEE89B1003957139F193E6BE7DA1DF5F1374B26A4643B0378B5BAF53D1,
        0x4142F826B71EE574452DBC47E05BC3E1A647478403A7BA38B7B93948F4E151D,
    )
