"""Hash-to-G2 RFC 9380 vectors (BLS12381G2_XMD:SHA-256_SSWU_RO_/NU_).

Vectors from /root/reference/ecc/bls12-381/hash_vectors_test.go:124-230
(themselves RFC 9380 Appendix J.10.1)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import hash_to_g2 as h2
from gnark_crypto_tpu.curves.g2 import g2_group
from gnark_crypto_tpu.towers.stacks import stack

DST_RO = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_"
DST_NU = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_NU_"


def e2(s):
    a0, a1 = s.split(",")
    return (int(a0, 16), int(a1, 16))


# msg "" and "abc" cases of hashToG2Vector
RO_CASES = [
    {
        "msg": b"",
        "u0": e2("0x03dbc2cce174e91ba93cbb08f26b917f98194a2ea08d1cce75b2b9cc9f21689d80bd79b594a613d0a68eb807dfdc1cf8,0x05a2acec64114845711a54199ea339abd125ba38253b70a92c876df10598bd1986b739cad67961eb94f7076511b3b39a"),
        "u1": e2("0x02f99798e8a5acdeed60d7e18e9120521ba1f47ec090984662846bc825de191b5b7641148c0dbc237726a334473eee94,0x145a81e418d4010cc027a68f14391b30074e89e60ee7a22f87217b2f6eb0c4b94c9115b436e6fa4607e95a98de30a435"),
        "Q0x": e2("0x019ad3fc9c72425a998d7ab1ea0e646a1f6093444fc6965f1cad5a3195a7b1e099c050d57f45e3fa191cc6d75ed7458c,0x171c88b0b0efb5eb2b88913a9e74fe111a4f68867b59db252ce5868af4d1254bfab77ebde5d61cd1a86fb2fe4a5a1c1d"),
        "Q0y": e2("0x0ba10604e62bdd9eeeb4156652066167b72c8d743b050fb4c1016c31b505129374f76e03fa127d6a156213576910fef3,0x0eb22c7a543d3d376e9716a49b72e79a89c9bfe9feee8533ed931cbb5373dde1fbcd7411d8052e02693654f71e15410a"),
        "Px": e2("0x0141ebfbdca40eb85b87142e130ab689c673cf60f1a3e98d69335266f30d9b8d4ac44c1038e9dcdd5393faf5c41fb78a,0x05cb8437535e20ecffaef7752baddf98034139c38452458baeefab379ba13dff5bf5dd71b72418717047f5b0f37da03d"),
        "Py": e2("0x0503921d7f6a12805e72940b963c0cf3471c7b2a524950ca195d11062ee75ec076daf2d4bc358c4b190c0c98064fdd92,0x12424ac32561493f3fe3c260708a12b7c620e7be00099a974e259ddc7d1f6395c3c811cdd19f1e8dbf3e9ecfdcbab8d6"),
    },
    {
        "msg": b"abc",
        "u0": e2("0x15f7c0aa8f6b296ab5ff9c2c7581ade64f4ee6f1bf18f55179ff44a2cf355fa53dd2a2158c5ecb17d7c52f63e7195771,0x01c8067bf4c0ba709aa8b9abc3d1cef589a4758e09ef53732d670fd8739a7274e111ba2fcaa71b3d33df2a3a0c8529dd"),
        "u1": e2("0x187111d5e088b6b9acfdfad078c4dacf72dcd17ca17c82be35e79f8c372a693f60a033b461d81b025864a0ad051a06e4,0x08b852331c96ed983e497ebc6dee9b75e373d923b729194af8e72a051ea586f3538a6ebb1e80881a082fa2b24df9f566"),
        "Q0x": e2("0x12b2e525281b5f4d2276954e84ac4f42cf4e13b6ac4228624e17760faf94ce5706d53f0ca1952f1c5ef75239aeed55ad,0x05d8a724db78e570e34100c0bc4a5fa84ad5839359b40398151f37cff5a51de945c563463c9efbdda569850ee5a53e77"),
        "Q0y": e2("0x02eacdc556d0bdb5d18d22f23dcb086dd106cad713777c7e6407943edbe0b3d1efe391eedf11e977fac55f9b94f2489c,0x04bbe48bfd5814648d0b9e30f0717b34015d45a861425fabc1ee06fdfce36384ae2c808185e693ae97dcde118f34de41"),
        "Px": e2("0x02c2d18e033b960562aae3cab37a27ce00d80ccd5ba4b7fe0e7a210245129dbec7780ccc7954725f4168aff2787776e6,0x139cddbccdc5e91b9623efd38c49f81a6f83f175e80b06fc374de9eb4b41dfe4ca3a230ed250fbe3a2acf73a41177fd8"),
        "Py": e2("0x1787327b68159716a37440985269cf584bcb1e621d3a7202be6ea05c4cfe244aeb197642555a0645fb87bf7466b2ba48,0x00aa65dae3c8d732d10ecd2c50f8a1baf3001578f71c694e03866e9f3d49ac1e1ce70dd94a733534f106d4cec0eddd16"),
    },
]

NU_CASE = {
    "msg": b"",
    "Px": e2("0x00e7f4568a82b4b7dc1f14c6aaa055edf51502319c723c4dc2688c7fe5944c213f510328082396515734b6612c4e7bb7,0x126b855e9e69b1f691f816e48ac6977664d24d99f8724868a184186469ddfd4617367e94527d4b74fc86413483afb35b"),
    "Py": e2("0x0caead0fd7b6176c01436833c79d305c78be307da5f6af6c133c47311def6ff1e0babf57a0fb5539fce7ee12407b0a42,0x1498aadcf7ae2b345243e281ae076df6de84455d766ab6fcdaad71fab60abb2e8b980a440043cd305db09d283c895e3d"),
}


def test_hash_to_field_g2_vectors():
    for case in RO_CASES:
        st = stack("bls12_381")
        u = h2.hash_to_field_g2("bls12_381", case["msg"], DST_RO, 2)
        got = st.tf.to_ints(u)
        assert tuple(got[0]) == case["u0"]
        assert tuple(got[1]) == case["u1"]


def test_map_to_curve_g2_vectors():
    st = stack("bls12_381")
    case = RO_CASES[0]
    u = h2.hash_to_field_g2("bls12_381", case["msg"], DST_RO, 2)
    q0 = h2.map_to_curve_sswu_g2("bls12_381", u[:, 0:1])
    gx = st.tf.to_ints(q0.x)[0]
    gy = st.tf.to_ints(q0.y)[0]
    assert tuple(gx) == case["Q0x"]
    assert tuple(gy) == case["Q0y"]


@pytest.mark.slow
def test_hash_to_g2_vectors():
    for case in RO_CASES[:1]:
        got = h2.hash_to_g2("bls12_381", case["msg"], DST_RO)
        assert got == (case["Px"], case["Py"])


@pytest.mark.slow
def test_encode_to_g2_vector():
    got = h2.encode_to_g2("bls12_381", NU_CASE["msg"], DST_NU)
    assert got == (NU_CASE["Px"], NU_CASE["Py"])


@pytest.mark.slow
def test_hash_to_g2_subgroup_bls12_377():
    """No RFC vectors for bls12-377 G2; check the output lands in the
    r-torsion (host oracle) and on the curve."""
    g = g2_group("bls12_377")
    hc = g.host_curve
    got = h2.hash_to_g2("bls12_377", b"hello", b"GNARK-TPU-TEST-DST")
    assert hc.is_on_curve(got)
    assert hc.mul(g.fr.modulus, got) is None


# ---------------------------------------------------------------------------
# bn254 G2 SVDW suite (ecc/bn254/hash_vectors_test.go:59-110)
# ---------------------------------------------------------------------------

BN_DST_RO = b"QUUX-V01-CS02-with-BN254G2_XMD:SHA-256_SVDW_RO_"
BN_DST_NU = b"QUUX-V01-CS02-with-BN254G2_XMD:SHA-256_SVDW_NU_"

BN_RO_CASES = [
    {
        "msg": b"",
        "Px": e2("0x1192005a0f121921a6d5629946199e4b27ff8ee4d6dd4f9581dc550ade851300,0x1747d950a6f23c16156e2171bce95d1189b04148ad12628869ed21c96a8c9335"),
        "Py": e2("0x498f6bb5ac309a07d9a8b88e6ff4b8de0d5f27a075830e1eb0e68ea318201d8,0x2c9755350ca363ef2cf541005437221c5740086c2e909b71d075152484e845f4"),
        "u0": e2("0x2c85988ecf26034a6d6c495c467150aeaead51fceb623aa99b0433275c8952c7,0x182126b31e6df7cf33844bf16a92f42072ee47f80539dace68dbfc3380d1fcbd"),
        "Q0x": e2("0x71e460ff150e978d833ef69fdf228f0d2c0807e3dce076b17dccdaa64bf6b25,0xab3b378f44776bd951140bfc354e68554ca76a4369a6b20d0da39e18e31fa38"),
        "Q0y": e2("0x2c6cdc66602f181b70022028cd584f9d021eb409af5bfcef716a180383140aaf,0x113b1e8168192dc9a8048152b61aab936ce3654bf5f67d3d63f53d4eee72e011"),
    },
    {
        "msg": b"abc",
        "Px": e2("0x16c88b54eec9af86a41569608cd0f60aab43464e52ce7e6e298bf584b94fccd2,0xb5db3ca7e8ef5edf3a33dfc3242357fbccead98099c3eb564b3d9d13cba4efd"),
        "Py": e2("0x1c42ba524cb74db8e2c680449746c028f7bea923f245e69f89256af2d6c5f3ac,0x22d02d2da7f288545ff8789e789902245ab08c6b1d253561eec789ec2c1bd630"),
        "u0": e2("0x234b244ed36d5acbb96a4f5fb67094945a0bb4ecf33d55bcc218ce834dc82c63,0x4ca11f51d0cf7e7393a0e6d7be3d0e6b07652d5ba308554a72dafe502dd59cc"),
        "Q0x": e2("0x254d44345e73654a4a41adc0b17f39b397c352693513b3439afe5596cba3c6b2,0x2d489087e8025d60a201c109bd6be0aac5e8b04593c1127e4f8cf9e654dd1f82"),
        "Q0y": e2("0xf1b1989fb5b87287ba1eee6b04426b1b3afb72c0aa8e981e392e740c0b2045,0x20d48c7925d6e00cf89487c737f49a0b5946158ca515fcc12516aefd33f9a45b"),
    },
]


@pytest.mark.slow
def test_bn254_svdw_map_vectors():
    """u0 -> Q0 through the SVDW map only (no cofactor clearing)."""
    st = stack("bn254")
    F = st.tf
    for case in BN_RO_CASES:
        u = h2.hash_to_field_g2("bn254", case["msg"], BN_DST_RO, 2)
        u_host = F.to_ints(u)
        assert tuple(u_host[0]) == case["u0"], "hash_to_field mismatch"
        q0 = h2._map_to_curve_g2("bn254", u[:, 0:1])
        got_x = F.to_ints(q0.x)[0]
        got_y = F.to_ints(q0.y)[0]
        assert tuple(got_x) == case["Q0x"], case["msg"]
        assert tuple(got_y) == case["Q0y"], case["msg"]


@pytest.mark.slow
def test_bn254_hash_to_g2_vectors():
    for case in BN_RO_CASES:
        P = h2.hash_to_g2("bn254", case["msg"], BN_DST_RO)
        assert P == (case["Px"], case["Py"]), case["msg"]
