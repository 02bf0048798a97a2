"""Poseidon2, Merkle tree, twisted Edwards, EdDSA tests."""

import hashlib

import numpy as np

from gnark_crypto_tpu.curves.edwards import (
    EdOracle,
    bn254_edwards,
    ed_add,
    ed_from_affine,
    ed_from_ints,
    ed_scalar_mul,
    ed_to_affine,
    ed_to_ints,
)
from gnark_crypto_tpu.fields import mont
from gnark_crypto_tpu.hashes.mimc import mimc
from gnark_crypto_tpu.hashes.poseidon2 import init_rc, poseidon2
from gnark_crypto_tpu.merkle import merkle
from gnark_crypto_tpu.signatures import eddsa


# ---- poseidon2 ------------------------------------------------------------


def _poseidon2_oracle(p2, values):
    """Independent host-int mirror of the permutation."""
    from gnark_crypto_tpu.fields.reference import PF

    pf = PF(p2.fr.modulus)
    keys = p2.round_keys
    t = p2.t

    def sbox(x):
        return pf.exp(x, 5)

    def ext(s):
        tot = 0
        for x in s:
            tot = pf.add(tot, x)
        return [pf.add(tot, x) for x in s] if t == 3 else [
            pf.add(pf.add(s[0], s[1]), s[0]),
            pf.add(pf.add(s[0], s[1]), s[1]),
        ]

    def internal(s):
        tot = pf.add(pf.add(s[0], s[1]), s[2])
        return [pf.add(s[0], tot), pf.add(s[1], tot),
                pf.add(pf.mul(2, s[2]), tot)]

    s = ext(list(values))
    half = p2.rf // 2
    for r in range(half):
        s = [pf.add(x, k) for x, k in zip(s, keys[r] + [0] * (t - len(keys[r])))]
        s = [sbox(x) for x in s]
        s = ext(s)
    for r in range(half, half + p2.rp):
        ks = keys[r]
        s = [pf.add(s[i], ks[i]) if i < len(ks) else s[i] for i in range(t)]
        s[0] = sbox(s[0])
        s = internal(s)
    for r in range(half + p2.rp, p2.rf + p2.rp):
        ks = keys[r]
        s = [pf.add(s[i], ks[i]) if i < len(ks) else s[i] for i in range(t)]
        s = [sbox(x) for x in s]
        s = ext(s)
    return s


def test_poseidon2_matches_oracle():
    p2 = poseidon2("bn254_fr", t=3, rf=8, rp=56)
    rng = np.random.default_rng(0)
    vals = [int(rng.integers(1, 2**62)) for _ in range(3)]
    got = p2.permutation_ints(vals)
    want = _poseidon2_oracle(p2, vals)
    assert got == want


def test_poseidon2_external_matrix_t4_reference_vectors():
    """Pins the reference's OWN poseidon2 test vectors — the t=4 external
    matrix columns (ecc/bn254/fr/poseidon2/poseidon2_test.go:14
    TestExternalMatrix; the reference ships no permutation vectors)."""
    p2 = poseidon2("bn254_fr", t=4, rf=8, rp=56)
    expected = [
        [5, 4, 1, 1],
        [7, 6, 3, 1],
        [1, 1, 5, 4],
        [3, 1, 7, 6],
    ]
    for i in range(4):
        e_i = [1 if j == i else 0 for j in range(4)]
        assert p2.mat_mul_external_ints(e_i) == expected[i], f"column {i}"


def test_poseidon2_permutation_regression_pins():
    """Known-answer regression pins for the t in {2,3} permutations (seed
    'seed', rf=8, rp=56 — the reference's bn254 defaults).  gnark ships no
    permutation vectors (see test above), so these pin OUR derivation: any
    accidental change to InitRC, the s-box, or a matrix breaks loudly."""
    p3 = poseidon2("bn254_fr", t=3, rf=8, rp=56)
    assert p3.permutation_ints([1, 2, 3]) == [
        15571809213078892285840203616867517674921597986400374819059929893048315946768,
        5857872240912140619689585280305245946803184430865921741146222927807831184426,
        2283637110863466612334237467174356005455705394011034277075293845503059942195,
    ]
    p2 = poseidon2("bn254_fr", t=2, rf=8, rp=56)
    assert p2.permutation_ints([1, 2]) == [
        15406673147010518163969564273745100346826454771908597067239849758277330536057,
        21238556399933915118464682749851775417735529586849382151721286090143868546426,
    ]


def test_poseidon2_key_schedule_shape():
    keys = init_rc("seed", 8, 56, 3, 97)
    assert len(keys) == 64
    assert all(len(keys[i]) == 3 for i in range(4))        # full-round rows
    assert all(len(keys[i]) == 1 for i in range(4, 56))    # partial rows
    assert all(len(keys[i]) == 0 for i in range(56, 64))   # reference quirk


# ---- merkle ---------------------------------------------------------------


def test_merkle_prove_verify():
    for n in (1, 2, 3, 5, 8, 13):
        leaves = [f"leaf-{i}".encode() for i in range(n)]
        root = merkle.tree_root(leaves)
        for idx in range(n):
            r, proof = merkle.prove(leaves, idx)
            assert r == root
            assert merkle.verify_proof(root, proof, idx, n)
            assert not merkle.verify_proof(root, proof, (idx + 1) % n, n) or n == 1
        # corrupted proof fails
        r, proof = merkle.prove(leaves, 0)
        bad = [proof[0] + b"x"] + proof[1:]
        assert not merkle.verify_proof(root, bad, 0, n)


def test_merkle_mimc_hasher():
    m = mimc("bn254_fr")

    def h(data: bytes) -> bytes:
        # pad to whole field elements
        bs = m.fr.bytes
        if len(data) % bs:
            data = data + b"\x00" * (bs - len(data) % bs)
        vals = [int.from_bytes(data[i:i + bs], "big") % m.fr.modulus
                for i in range(0, len(data), bs)]
        return m.hash_ints(vals).to_bytes(bs, "big")

    leaves = [i.to_bytes(32, "big") for i in range(4)]
    root = merkle.tree_root(leaves, h)
    r, proof = merkle.prove(leaves, 2, h)
    assert r == root and merkle.verify_proof(root, proof, 2, 4, h)


# ---- twisted Edwards + EdDSA ---------------------------------------------


def test_edwards_add_mul_vs_oracle():
    es = bn254_edwards()
    o = EdOracle(es)
    G = (es.bx, es.by)
    pts = [o.mul(k, G) for k in (1, 5, 123456789)]
    dev = ed_from_affine(es, ed_from_ints(es, pts))
    got = ed_to_ints(es, ed_to_affine(es, ed_add(es, dev, dev)))
    want = [o.add(p, p) for p in pts]
    assert list(got) == want

    ks = [0, 1, 98765432123456789]
    s = mont.from_ints(es.fr, ks, mont=False)
    got = ed_to_ints(es, ed_to_affine(es, ed_scalar_mul(es, dev, s)))
    want = [o.mul(k, p) for k, p in zip(ks, pts)]
    assert list(got) == want


def test_eddsa_sign_verify():
    es = bn254_edwards()
    m = mimc("bn254_fr")
    priv = eddsa.generate_key(es, b"\x01" * 32)
    msg = (1234567).to_bytes(32, "big")
    sig = eddsa.sign(es, priv, msg, m)
    assert eddsa.verify(es, priv.public, sig, msg, m)
    bad = eddsa.Signature(r=sig.r, s=(sig.s + 1) % es.order)
    assert not eddsa.verify(es, priv.public, bad, msg, m)
    # wrong message
    msg2 = (7654321).to_bytes(32, "big")
    assert not eddsa.verify(es, priv.public, sig, msg2, m)


def test_eddsa_batch_verify_device():
    es = bn254_edwards()
    m = mimc("bn254_fr")
    privs = [eddsa.generate_key(es, bytes([i]) * 32) for i in range(1, 4)]
    msgs = [int(100 + i).to_bytes(32, "big") for i in range(3)]
    sigs = [eddsa.sign(es, p, mm, m) for p, mm in zip(privs, msgs)]
    pubs = [p.public for p in privs]
    ok = eddsa.batch_verify(es, pubs, sigs, msgs, m)
    assert ok.all()
    sigs[1] = eddsa.Signature(r=sigs[1].r, s=(sigs[1].s + 1) % es.order)
    ok = eddsa.batch_verify(es, pubs, sigs, msgs, m)
    assert ok[0] and not ok[1] and ok[2]


# ---------------------------------------------------------------------------
# streaming Merkle accumulator (tree.go:206-330)
# ---------------------------------------------------------------------------


def test_stream_tree_matches_batch_root():
    from gnark_crypto_tpu.merkle import merkle

    for n in (1, 2, 3, 5, 8, 11, 16):
        leaves = [bytes([i]) * 8 for i in range(n)]
        t = merkle.Tree()
        for l in leaves:
            t.push(l)
        assert t.root() == merkle.tree_root(leaves), n


def test_stream_tree_prove_matches_batch():
    from gnark_crypto_tpu.merkle import merkle

    n = 11
    leaves = [bytes([i]) * 8 for i in range(n)]
    for idx in range(n):
        t = merkle.Tree()
        t.set_index(idx)
        for l in leaves:
            t.push(l)
        root, proof, pidx, nl = t.prove()
        want_root, want_proof = merkle.prove(leaves, idx)
        assert root == want_root
        assert proof == want_proof, idx
        assert merkle.verify_proof(root, proof, pidx, nl)


def test_push_subtree():
    import pytest

    from gnark_crypto_tpu.merkle import merkle

    leaves = [bytes([i]) * 8 for i in range(8)]
    sub = merkle.Tree()
    for l in leaves[:4]:
        sub.push(l)
    t = merkle.Tree()
    t.push_subtree(2, sub.root())
    for l in leaves[4:]:
        t.push(l)
    assert t.root() == merkle.tree_root(leaves)

    # too-tall subtree after a single leaf
    t2 = merkle.Tree()
    t2.push(leaves[0])
    with pytest.raises(ValueError):
        t2.push_subtree(2, sub.root())

    # subtree containing the proof index is rejected
    t3 = merkle.Tree()
    t3.set_index(1)
    with pytest.raises(ValueError):
        t3.push_subtree(2, sub.root())

    # SetIndex after pushes is rejected
    t4 = merkle.Tree()
    t4.push(leaves[0])
    with pytest.raises(ValueError):
        t4.set_index(0)
