"""Merkle tree accumulator, compatible with the reference's (Sia-derived)
shape and hashing (accumulator/merkletree/tree.go:36-330, verify.go).

The gnark fork disables the 0x00/0x01 domain-separation prefixes
(tree.go:92-106: leafSum = H(data), nodeSum = H(a || b)) — we match that.
Tree shape: equal-height subtrees joined greedily (binary-counter order),
i.e. for n leaves the left subtree has the largest power of two < n leaves.

Host-side module (protocol glue; per-level batched hashing over device MiMC is
exposed via `hasher=` taking bytes -> bytes)."""

from __future__ import annotations

import hashlib
from typing import Callable

Hasher = Callable[[bytes], bytes]


def _default_hasher(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def leaf_sum(h: Hasher, data: bytes) -> bytes:
    return h(data)


def node_sum(h: Hasher, a: bytes, b: bytes) -> bytes:
    return h(a + b)


def _split(n: int) -> int:
    """Left subtree size: largest power of two strictly less than n."""
    k = 1
    while k * 2 < n:
        k *= 2
    return k


def tree_root(leaves: list[bytes], h: Hasher = _default_hasher) -> bytes:
    assert leaves
    sums = [leaf_sum(h, l) for l in leaves]

    def rec(xs):
        if len(xs) == 1:
            return xs[0]
        k = _split(len(xs))
        return node_sum(h, rec(xs[:k]), rec(xs[k:]))

    return rec(sums)


def prove(leaves: list[bytes], index: int, h: Hasher = _default_hasher):
    """Returns (root, proof_set) with proof_set[0] = leaf data hash base
    (the raw leaf data, as in tree.go Prove which returns the leaf's data
    hash first)."""
    assert 0 <= index < len(leaves)
    sums = [leaf_sum(h, l) for l in leaves]
    proof = [leaves[index]]

    def rec(xs, idx):
        if len(xs) == 1:
            return xs[0]
        k = _split(len(xs))
        if idx < k:
            left = rec(xs[:k], idx)
            right = _root(xs[k:])
            proof.append(right)
            return node_sum(h, left, right)
        left = _root(xs[:k])
        right = rec(xs[k:], idx - k)
        proof.append(left)
        return node_sum(h, left, right)

    def _root(xs):
        if len(xs) == 1:
            return xs[0]
        k = _split(len(xs))
        return node_sum(h, _root(xs[:k]), _root(xs[k:]))

    root = rec(sums, index)
    return root, proof


def verify_proof(root: bytes, proof_set: list[bytes], proof_index: int,
                 num_leaves: int, h: Hasher = _default_hasher) -> bool:
    """VerifyProof (verify.go): recompute the root from the leaf and sibling
    hashes, deciding left/right by the index within each subtree."""
    if not proof_set or proof_index >= num_leaves:
        return False

    def rec(n, idx, pos):
        # returns (computed sum, next proof position) for a subtree of n
        # leaves containing idx
        if n == 1:
            return leaf_sum(h, proof_set[0]), 1
        k = _split(n)
        if idx < k:
            s, pos = rec(k, idx, pos)
            if s is None or pos >= len(proof_set):
                return None, pos
            return node_sum(h, s, proof_set[pos]), pos + 1
        s, pos = rec(n - k, idx - k, pos)
        if s is None:
            return None, pos
        if pos >= len(proof_set):
            return None, pos
        return node_sum(h, proof_set[pos], s), pos + 1

    s, pos = rec(num_leaves, proof_index, 1)
    return s is not None and pos == len(proof_set) and s == root
