"""Serialization (Domain/SRS/Encoder-Decoder), ECDSA recovery, and
Strauss-Shamir joint scalar multiplication."""

import io

import numpy as np

from gnark_crypto_tpu.commit import kzg
from gnark_crypto_tpu.curves import bn254, point as gp, secp256k1
from gnark_crypto_tpu.curves.marshal import g1_from_bytes, g1_to_bytes
from gnark_crypto_tpu.fft import Domain
from gnark_crypto_tpu.fields import get_spec, mont
from gnark_crypto_tpu.pairing.pairing import pairing_ctx
from gnark_crypto_tpu.signatures import ecdsa
from gnark_crypto_tpu.utils import serialize


def test_domain_roundtrip():
    spec = get_spec("bn254_fr")
    d = Domain(spec, 64)
    buf = io.BytesIO()
    serialize.domain_write(d, buf)
    buf.seek(0)
    d2 = serialize.domain_read(buf)
    assert d2.cardinality == d.cardinality
    assert d2.generator == d.generator
    np.testing.assert_array_equal(np.asarray(d2.twiddles), np.asarray(d.twiddles))


def test_srs_dump_load(tmp_path):
    cs = bn254()
    tw = pairing_ctx("bn254")
    srs = kzg.new_srs(cs, tw, 8, tau=1234567)
    path = str(tmp_path / "srs.npz")
    serialize.srs_dump(srs, path)
    srs2 = serialize.srs_load(path)
    np.testing.assert_array_equal(np.asarray(srs.pk.g1.x), np.asarray(srs2.pk.g1.x))
    np.testing.assert_array_equal(np.asarray(srs.pk.g1.y), np.asarray(srs2.pk.g1.y))
    assert srs2.vk.g2 == srs.vk.g2 and srs2.vk.g1 == srs.vk.g1
    assert srs2.vk.curve == "bn254"


def test_encoder_decoder_roundtrip():
    cs = bn254()
    spec = cs.fr
    rng = np.random.default_rng(11)
    vals = [int(x) for x in rng.integers(0, 2**63, 5)]
    fr_vec = mont.from_ints(spec, vals)
    pts_host = [cs.ref.mul(k, cs.generator) for k in (1, 2, 3)] + [None]
    pts = gp.affine_from_ints(cs, pts_host)

    for raw in (False, True):
        buf = io.BytesIO()
        enc = serialize.Encoder(buf, raw=raw)
        enc.write_fr_vector(spec, fr_vec)
        enc.write_g1_vector(cs, pts)
        buf.seek(0)
        dec = serialize.Decoder(buf)
        kind, sp, arr = dec.read()
        assert kind == "fr" and sp is spec
        assert [int(v) for v in mont.to_ints(spec, arr)] == [
            v % spec.modulus for v in vals
        ]
        kind, cs2, pts2 = dec.read()
        assert kind == "g1"
        got = gp.affine_to_ints(cs2, pts2)
        for want, have in zip(pts_host, got):
            if want is None:
                assert have is None or (int(have[0]), int(have[1])) == (0, 0)
            else:
                assert (int(have[0]), int(have[1])) == want


def test_marshal_infinity_and_flags():
    cs = bn254()
    P = cs.ref.mul(7, cs.generator)
    for raw in (False, True):
        data = g1_to_bytes(cs, P, raw=raw)
        back = g1_from_bytes(cs, data)
        assert back == P
    assert g1_from_bytes(cs, g1_to_bytes(cs, None)) is None


def test_ecdsa_sign_for_recover():
    for cs_f in (secp256k1, bn254):
        cs = cs_f()
        priv = ecdsa.generate_key(cs, b"recover-test")
        msg_hash = bytes(range(32))
        v, sig = ecdsa.sign_for_recover(cs, priv, msg_hash)
        assert ecdsa.verify(cs, priv.public, sig, msg_hash)
        pub = ecdsa.recover_public_key(cs, v, sig, msg_hash)
        assert pub.a == priv.public.a


def test_joint_scalar_mul():
    cs = bn254()
    rng = np.random.default_rng(13)
    ks = [int(x) for x in rng.integers(1, 2**62, 3)]
    a1 = gp.affine_from_ints(cs, [cs.ref.mul(k, cs.generator) for k in ks])
    a2 = gp.affine_from_ints(cs, [cs.ref.mul(k + 1, cs.generator) for k in ks])
    s1 = gp.scalars_from_ints(cs, [5, 1, 0])
    s2 = gp.scalars_from_ints(cs, [7, 0, 9])
    got = gp.jac_to_affine(cs, gp.joint_scalar_mul(cs, a1, a2, s1, s2))
    host = gp.affine_to_ints(cs, got)
    for i, (u, v) in enumerate(zip((5, 1, 0), (7, 0, 9))):
        want = cs.ref.add(
            cs.ref.mul(u * ks[i], cs.generator),
            cs.ref.mul(v * (ks[i] + 1), cs.generator),
        )
        if want is None:
            assert host[i] is None or tuple(map(int, host[i])) == (0, 0)
        else:
            assert tuple(map(int, host[i])) == want


def test_async_raw_io_roundtrip(tmp_path):
    """Double-buffered raw dump/load (AsyncReadFrom analogue, SURVEY §2.8 P6)."""
    import numpy as np

    from gnark_crypto_tpu.utils import async_io

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 1 << 16, (16, 1000), dtype=np.uint32)
    p = str(tmp_path / "arr.raw")
    async_io.write_limb_array(p, arr)
    back = async_io.read_limb_array_async(p, chunk_bytes=4096)
    assert (np.asarray(back) == arr).all()
