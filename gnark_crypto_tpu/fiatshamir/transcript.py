"""Fiat-Shamir transcript with named, ordered challenges.

Host-side mirror of fiat-shamir/transcript.go:20-127: challenges are declared
up front in order; Bind appends data to a challenge before it is computed;
ComputeChallenge hashes (name ∥ previous-challenge ∥ bindings) and locks the
ordering.  Transcript logic is sequential/tiny, so it runs on host and feeds
scalars to the device kernels (SURVEY.md §7 hard part #4: host/device split
for transcript logic)."""

from __future__ import annotations

import hashlib


class Transcript:
    def __init__(self, hash_name: str, challenge_ids: list[str]):
        self.hash_name = hash_name
        self.order = list(challenge_ids)
        self.bindings: dict[str, list[bytes]] = {c: [] for c in challenge_ids}
        self.values: dict[str, bytes] = {}
        self.position = 0

    def _h(self) -> "hashlib._Hash":
        return hashlib.new(self.hash_name)

    def bind(self, challenge_id: str, data: bytes):
        """Transcript.Bind (transcript.go:50): append data to a not-yet-computed
        challenge."""
        if challenge_id in self.values:
            raise ValueError(f"challenge {challenge_id} already computed")
        if challenge_id not in self.bindings:
            raise KeyError(challenge_id)
        self.bindings[challenge_id].append(bytes(data))

    def compute_challenge(self, challenge_id: str) -> bytes:
        """transcript.go:75: H(name ∥ prev_challenge ∥ bindings), enforcing
        declaration order."""
        if challenge_id in self.values:
            return self.values[challenge_id]
        idx = self.order.index(challenge_id)
        if idx != self.position:
            raise ValueError(
                f"challenge {challenge_id} out of order (expected "
                f"{self.order[self.position]})"
            )
        h = self._h()
        h.update(challenge_id.encode())
        if idx > 0:
            h.update(self.values[self.order[idx - 1]])
        for d in self.bindings[challenge_id]:
            h.update(d)
        out = h.digest()
        self.values[challenge_id] = out
        self.position += 1
        return out

    def challenge_scalar(self, challenge_id: str, modulus: int) -> int:
        return int.from_bytes(self.compute_challenge(challenge_id), "big") % modulus
