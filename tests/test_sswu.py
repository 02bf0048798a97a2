"""SSWU hash-to-curve (RFC 9380 §6.6.2/§6.6.3) tests.

Bit-exact vectors for BLS12-381 G1 from the reference's
ecc/bls12-381/hash_vectors_test.go (= RFC 9380 §J.9.1, suite
BLS12381G1_XMD:SHA-256_SSWU_RO_/NU_); structural properties (on-curve,
r-torsion after cofactor clearing) for every SSWU curve."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import spec as cspec
from gnark_crypto_tpu.curves.hash_to_curve import encode_to_g1, hash_to_g1
from gnark_crypto_tpu.curves.point import affine_to_ints
from gnark_crypto_tpu.curves.sswu import map_to_curve_sswu, suite_g1
from gnark_crypto_tpu.fields import mont

SSWU_CURVES = ["bls12_381", "bls12_377", "bls24_315", "bls24_317",
               "bw6_761", "bw6_633"]

_DST_RO = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
_DST_NU = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_NU_"

# (msg, x, y) from ecc/bls12-381/hash_vectors_test.go
_HASH_VECTORS = [
    (b"",
     0x052926add2207b76ca4fa57a8734416c8dc95e24501772c814278700eed6d1e4e8cf62d9c09db0fac349612b759e79a1,
     0x08ba738453bfed09cb546dbb0783dbb3a5f1f566ed67bb6be0e8c67e2e81a4cc68ee29813bb7994998f3eae0c9c6a265),
    (b"abc",
     0x03567bc5ef9c690c2ab2ecdf6a96ef1c139cc0b2f284dca0a9a7943388a49a3aee664ba5379a7655d3c68900be2f6903,
     0x0b9c15f3fe6e5cf4211f346271d7b01c8f3b28be689c8429c85b67af215533311f0b8dfaaa154fa6b88176c229f2885d),
    (b"abcdef0123456789",
     0x11e0b079dea29a68f0383ee94fed1b940995272407e3bb916bbf268c263ddd57a6a27200a784cbc248e84f357ce82d98,
     0x03a87ae2caf14e8ee52e51fa2ed8eefe80f02457004ba4d486d6aa1f517c0889501dc7413753f9599b099ebcbbd2d709),
]

_ENCODE_VECTORS = [
    (b"",
     0x184bb665c37ff561a89ec2122dd343f20e0f4cbcaec84e3c3052ea81d1834e192c426074b02ed3dca4e7676ce4ce48ba,
     0x04407b8d35af4dacc809927071fc0405218f1401a6d15af775810e4e460064bcc9468beeba82fdc751be70476c888bf3),
    (b"abc",
     0x009769f3ab59bfd551d53a5f846b9984c59b97d6842b20a2c565baa167945e3d026a3755b6345df8ec7e6acb6868ae6d,
     0x1532c00cf61aa3d0ce3e5aa20c3b531a2abd2c770a790a2613818303c6b830ffc0ecf6c357af3317b9575c567f11cd2c),
]


@pytest.mark.parametrize("msg,x,y", _HASH_VECTORS)
def test_bls12_381_hash_to_g1_vectors(msg, x, y):
    cs = cspec.bls12_381()
    px, py = hash_to_g1(cs, msg, _DST_RO)
    assert (int(px), int(py)) == (x, y)


@pytest.mark.parametrize("msg,x,y", _ENCODE_VECTORS)
def test_bls12_381_encode_to_g1_vectors(msg, x, y):
    cs = cspec.bls12_381()
    px, py = encode_to_g1(cs, msg, _DST_NU)
    assert (int(px), int(py)) == (x, y)


@pytest.mark.parametrize("curve", SSWU_CURVES)
def test_sswu_map_on_curve(curve):
    cs = getattr(cspec, curve)()
    suite_g1(curve)  # triggers import-time isogeny verification
    rng = np.random.default_rng(7)
    us = [int(x) % cs.fp.modulus for x in rng.integers(1, 2**63, 5)]
    us += [0, 1]
    u = mont.from_ints(cs.fp, us)
    q = map_to_curve_sswu(cs, u)
    pts = affine_to_ints(cs, q)
    p = cs.fp.modulus
    for (px, py) in pts:
        assert (py * py - px**3 - cs.a * px - cs.b) % p == 0


@pytest.mark.parametrize("curve", SSWU_CURVES)
def test_hash_to_g1_r_torsion(curve):
    """hash_to_g1 output must be on curve and killed by r (subgroup member)."""
    cs = getattr(cspec, curve)()
    P = hash_to_g1(cs, b"gnark-crypto-tpu", b"TEST-DST-" + curve.encode())
    px, py = int(P[0]), int(P[1])
    p = cs.fp.modulus
    assert (py * py - px**3 - cs.a * px - cs.b) % p == 0
    assert cs.ref.mul(cs.fr.modulus, (px, py)) is None  # [r]P = inf
    # deterministic
    P2 = hash_to_g1(cs, b"gnark-crypto-tpu", b"TEST-DST-" + curve.encode())
    assert (int(P2[0]), int(P2[1])) == (px, py)
