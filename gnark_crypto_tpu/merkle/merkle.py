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


class Tree:
    """Streaming Merkle accumulator (tree.go:36-330): O(log n) state, leaves
    pushed one at a time (Push) or as whole cached subtrees (PushSubTree),
    with an incrementally-built proof for the leaf chosen via SetIndex.

    The subtree stack is kept smallest-height first (the reference's `head`
    chain); equal heights join eagerly, recording the sibling hash in the
    proof set exactly when its height equals len(proof_set) - 1."""

    def __init__(self, hasher: Hasher = _default_hasher):
        self._h = hasher
        self._stack: list[tuple[int, bytes]] = []   # (height, sum), head first
        self.current_index = 0
        self.proof_index = 0
        self._proof_set: list[bytes] = []
        self._proof_tree = False

    def set_index(self, i: int) -> None:
        """SetIndex (tree.go:318): must be called before any Push."""
        if self._stack:
            raise ValueError(
                "cannot call SetIndex on Tree if Tree has not been reset")
        self._proof_tree = True
        self.proof_index = i

    def push(self, data: bytes) -> None:
        """Push one leaf (tree.go:206)."""
        if self.current_index == self.proof_index and self._proof_tree:
            self._proof_set.append(data)
        self._stack.insert(0, (0, leaf_sum(self._h, data)))
        self._join_all()          # joins BEFORE the index update (tree.go:227)
        self.current_index += 1

    def push_subtree(self, height: int, sum_: bytes) -> None:
        """PushSubTree (tree.go:254): a pre-hashed complete subtree of
        2^height leaves; must not contain the proof index and must not be
        taller than the current smallest subtree."""
        new_index = self.current_index + (1 << height)
        if self._proof_tree and (
            self.current_index == self.proof_index
            or self.current_index < self.proof_index < new_index
        ):
            raise ValueError(
                "the cached tree shouldn't contain the element to prove")
        if self._stack and height > self._stack[0][0]:
            raise ValueError(
                f"can't add a subtree that is larger than the smallest "
                f"subtree {height} > {self._stack[0][0]}")
        self._stack.insert(0, (height, sum_))
        self._join_all()
        self.current_index = new_index

    def _join_all(self) -> None:
        while len(self._stack) >= 2 and self._stack[0][0] == self._stack[1][0]:
            (hgt, right), (_, left) = self._stack[0], self._stack[1]
            if self._proof_tree and hgt == len(self._proof_set) - 1:
                leaves = 1 << hgt
                mid = (self.current_index // leaves) * leaves
                self._proof_set.append(right if self.proof_index < mid
                                       else left)
            self._stack = [(hgt + 1, node_sum(self._h, left, right))] \
                + self._stack[2:]

    def root(self) -> bytes | None:
        """Root (tree.go:300): fold the stack smallest-first into the
        next-larger subtree (taller subtree is the left operand)."""
        if not self._stack:
            return None
        cur = self._stack[0][1]
        for _, s in self._stack[1:]:
            cur = node_sum(self._h, s, cur)
        return cur

    def prove(self):
        """Prove (tree.go:137): (root, proof_set, proof_index, num_leaves)
        for the index chosen by set_index."""
        if not self._proof_tree:
            raise ValueError(
                "wrong usage: can't call prove on a tree if SetIndex "
                "wasn't called")
        if not self._stack or not self._proof_set:
            return self.root(), None, self.proof_index, self.current_index
        proof = list(self._proof_set)
        # combine subtrees smaller than the proof subtree into one right
        # sibling, then larger subtrees join as left siblings
        stack = list(self._stack)
        while len(stack) >= 2 and stack[1][0] < len(proof) - 1:
            (hgt, right), (lh, left) = stack[0], stack[1]
            stack = [(lh + 1, node_sum(self._h, left, right))] + stack[2:]
        if len(stack) >= 2 and stack[1][0] == len(proof) - 1:
            proof.append(stack[0][1])
            stack = stack[1:]
        for _, s in stack[1:]:
            proof.append(s)
        return self.root(), proof, self.proof_index, self.current_index


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
