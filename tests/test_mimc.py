"""MiMC vs gnark-crypto's own test vectors — bit-exact check of the whole
stack (limbed Montgomery mul -> keccak constant chain -> round function).
Vectors: ecc/bn254/fr/mimc/test_vectors/vectors.json (copied verbatim)."""

import json
import os

import numpy as np

from gnark_crypto_tpu.fields import mont
from gnark_crypto_tpu.hashes.mimc import mimc

VEC = os.path.join(os.path.dirname(__file__), "vectors", "mimc_bn254.json")


def test_mimc_bn254_vectors():
    with open(VEC) as f:
        cases = json.load(f)
    h = mimc("bn254_fr")
    for case in cases:
        inputs = [int(x, 16) for x in case["in"]]
        want = int(case["out"], 16)
        got = h.hash_ints(inputs)
        assert got == want, f"MiMC mismatch for {case['in']}"


def test_mimc_batched_matches_single():
    h = mimc("bn254_fr")
    r = h.fr.modulus
    rng = np.random.default_rng(0)
    batch = [[int(rng.integers(0, 2**62)) % r for _ in range(3)] for _ in range(4)]
    # batched: (n_limbs, n_blocks, B)
    arr = np.array(batch, dtype=object).T  # (3 blocks, 4 instances)
    blocks = mont.from_ints(h.fr, arr)
    out = h.hash_blocks(blocks)
    got = [int(v) for v in mont.to_ints(h.fr, out)]
    want = [h.hash_ints(b) for b in batch]
    assert got == want
