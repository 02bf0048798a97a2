"""FRI low-degree proximity proofs (radix-2), Merkle-committed rounds.

Mirrors ecc/bn254/fr/fri/fri.go: Iopp :126, BuildProofOfProximity :495,
VerifyProofOfProximity :674, GetRho :144, folding in the evaluation domain.
Evaluations are committed per-round in "paired" order (f(x), f(-x)) adjacent
(the reference's canonical->sorted maps, fri.go:202-248), so one Merkle leaf
opens both points needed by a fold query.

Device work: the big NTT evaluation + the vectorized fold per round.  Merkle
trees, transcript and queries are host glue."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fft import Domain, ntt
from ..fiatshamir.transcript import Transcript
from ..fields import mont
from ..fields.reference import PF
from ..fields.spec import FieldSpec
from ..merkle import merkle

RHO = 8  # blow-up factor 1/rho rate (GetRho, fri.go:144)
NB_QUERIES = 10


def _elem_bytes(spec: FieldSpec, v: int) -> bytes:
    return int(v).to_bytes(spec.bytes, "big")


@dataclasses.dataclass
class FriRound:
    root: bytes
    evals: np.ndarray  # host ints, paired order (kept by prover only)


@dataclasses.dataclass
class FriQueryStep:
    pair: tuple  # (f(x), f(-x)) ints
    proof: list  # merkle proof for the pair leaf
    index: int   # leaf index


@dataclasses.dataclass
class FriProof:
    roots: list
    final_poly: list        # coefficients of the last folded poly, in clear
    queries: list           # [ [FriQueryStep per round] per query ]


class Iopp:
    """FRI instance for max degree `size` over `spec` (fri.go Iopp)."""

    def __init__(self, spec: FieldSpec, size: int, rho: int = RHO,
                 nb_queries: int = NB_QUERIES):
        self.spec = spec
        self.rho = rho
        self.nb_queries = nb_queries
        self.size = size
        self.domain_size = size * rho
        self.domain = Domain(spec, self.domain_size, with_coset_tables=False)
        self.nb_steps = (size).bit_length() - 1 + 0  # fold down to rho points
        self.pf = PF(spec.modulus)

    # sorted <-> canonical index maps (fri.go:202-248 public surface)
    @staticmethod
    def convert_canonical_sorted(i: int, n: int) -> int:
        """Canonical index -> its position in the fiber-sorted layout
        {q(g^0), q(g^(n/2)), q(g^1), ...} (convertCanonicalSorted,
        fri.go:201)."""
        if i < n // 2:
            return 2 * i
        l = 2 * (n - (i + 1))
        return n - l - 1

    @staticmethod
    def sort_evals(evals):
        """Canonical evaluation order -> fiber-sorted pairs (x, -x) adjacent
        (sort, fri.go:236)."""
        n = len(evals) // 2
        out = [None] * (2 * n)
        for i in range(n):
            out[2 * i] = evals[i]
            out[2 * i + 1] = evals[i + n]
        return out

    def derive_queries_positions(self, pos: int, size: int) -> list[int]:
        """Per-round query positions in sorted form
        (deriveQueriesPositions, fri.go:219)."""
        s = size // 2
        res = [pos]
        for _ in range(1, self.nb_steps):
            t = (res[-1] - (res[-1] % 2)) // 2
            res.append(self.convert_canonical_sorted(t, s))
            s //= 2
        return res

    # paired order: position i holds (f(w^i), f(w^(i + n/2))) = (f(x), f(-x))
    def _pairs(self, evals: np.ndarray) -> list[bytes]:
        n = len(evals)
        return [
            _elem_bytes(self.spec, evals[i]) + _elem_bytes(self.spec, evals[i + n // 2])
            for i in range(n // 2)
        ]

    def build_proof(self, coeffs, transcript: Transcript | None = None) -> FriProof:
        """coeffs: mont fr array (n_limbs, size) (BuildProofOfProximity)."""
        spec = self.spec
        q = spec.modulus
        import jax.numpy as jnp

        padded = jnp.concatenate(
            [coeffs, mont.zeros(spec, (self.domain_size - coeffs.shape[1],))],
            axis=1,
        )
        evals_dev = ntt(self.domain, padded)
        evals = np.array([int(v) for v in mont.to_ints(spec, evals_dev)],
                         dtype=object)
        names = [f"fri_xi_{i}" for i in range(self.nb_steps)]
        t = transcript or Transcript("sha256", names)
        roots, rounds = [], []
        w = self.domain.generator
        n = self.domain_size
        gen = w
        for step in range(self.nb_steps):
            leaves = self._pairs(evals)
            root = merkle.tree_root(leaves)
            roots.append(root)
            rounds.append(FriRound(root=root, evals=evals))
            t.bind(names[step], root)
            xi = t.challenge_scalar(names[step], q)
            # fold: f'(x^2) = (f(x)+f(-x))/2 + xi*(f(x)-f(-x))/(2x)
            half = n // 2
            inv2 = self.pf.inv(2)
            new = np.empty(half, dtype=object)
            x = 1
            for i in range(half):
                fx, fmx = int(evals[i]), int(evals[i + half])
                even = (fx + fmx) * inv2 % q
                odd = (fx - fmx) * inv2 % q * self.pf.inv(x) % q
                new[i] = (even + xi * odd) % q
                x = x * gen % q
            evals = new
            n = half
            gen = gen * gen % q  # generator of the halved domain... (w^2)
        # final: n == rho points of a degree-<1 polynomial: constant check
        final_vals = [int(v) for v in evals]
        # interpolate the final constant-degree poly: degree < rho... send values
        # derive query positions
        qname = "fri_queries"
        t2 = Transcript("sha256", [qname])
        for r_ in roots:
            t2.bind(qname, r_)
        seed = t2.challenge_scalar(qname, 1 << 63)
        rng = np.random.default_rng(seed)
        queries = []
        for _ in range(self.nb_queries):
            idx = int(rng.integers(0, self.domain_size // 2))
            steps = []
            nn = self.domain_size
            pos = idx
            for step in range(self.nb_steps):
                ev = rounds[step].evals
                half = nn // 2
                pos %= half
                leaves = self._pairs(ev)
                _, proof = merkle.prove(leaves, pos)
                steps.append(
                    FriQueryStep(
                        pair=(int(ev[pos]), int(ev[pos + half])),
                        proof=proof,
                        index=pos,
                    )
                )
                nn = half
            queries.append(steps)
        return FriProof(roots=roots, final_poly=final_vals, queries=queries)

    def verify_proof(self, proof: FriProof) -> bool:
        spec = self.spec
        q = spec.modulus
        names = [f"fri_xi_{i}" for i in range(self.nb_steps)]
        t = Transcript("sha256", names)
        xis = []
        for step in range(self.nb_steps):
            t.bind(names[step], proof.roots[step])
            xis.append(t.challenge_scalar(names[step], q))
        # recompute query positions
        qname = "fri_queries"
        t2 = Transcript("sha256", [qname])
        for r_ in proof.roots:
            t2.bind(qname, r_)
        seed = t2.challenge_scalar(qname, 1 << 63)
        rng = np.random.default_rng(seed)
        inv2 = self.pf.inv(2)
        w0 = self.domain.generator
        for steps in proof.queries:
            idx = int(rng.integers(0, self.domain_size // 2))
            nn = self.domain_size
            pos = idx
            gen = w0
            for step in range(self.nb_steps):
                half = nn // 2
                pos %= half
                st = steps[step]
                if st.index != pos:
                    return False
                leaf = (_elem_bytes(spec, st.pair[0])
                        + _elem_bytes(spec, st.pair[1]))
                if st.proof[0] != leaf:
                    return False
                if not merkle.verify_proof(proof.roots[step], st.proof, pos, half):
                    return False
                fx, fmx = st.pair
                x = pow(gen, pos, q)
                even = (fx + fmx) * inv2 % q
                odd = (fx - fmx) * inv2 % q * self.pf.inv(x) % q
                folded = (even + xis[step] * odd) % q
                # consistency with next round's claimed value
                if step + 1 < self.nb_steps:
                    nxt = steps[step + 1]
                    npos = pos % (half // 2)
                    expected = nxt.pair[0] if pos < half // 2 else nxt.pair[1]
                    if folded != expected:
                        return False
                else:
                    if folded != proof.final_poly[pos % len(proof.final_poly)] % q:
                        return False
                nn = half
                gen = gen * gen % q
            # final poly must be degree 0 across queries? rho points of a
            # constant polynomial after folding size->1:
        # final_poly must be the evaluation of a degree-0 poly on the final
        # domain only if we folded log2(size) times; with blow-up rho the
        # final values are rho evaluations of a constant: all equal
        if len(set(v % q for v in proof.final_poly)) != 1:
            return False
        return True
