"""Sumcheck prover/verifier for claims of the form

    claim = sum_{x in {0,1}^v} prod_j M_j(x)

over multilinears M_j (the concrete instance backing GKR; the reference's
generic Claims machinery is fr/sumcheck/sumcheck.go — our device analogue
keeps folds batched and drives challenges through the Fiat-Shamir transcript).
"""

from __future__ import annotations

import dataclasses

from ..fiatshamir.transcript import Transcript
from ..fields import mont
from ..fields.reference import PF
from ..fields.spec import FieldSpec
from .multilin import fold, hypercube_sum


@dataclasses.dataclass
class SumcheckProof:
    # per round: evaluations of the round univariate at t = 0..deg
    round_polys: list[list[int]]
    final_evals: list[int]  # M_j(r) for the final check


def _eval_products(spec: FieldSpec, ms) -> int:
    acc = ms[0]
    for m in ms[1:]:
        acc = mont.mul(spec, acc, m)
    return acc


def _to_int(spec, v):
    return int(mont.to_ints(spec, v[:, None])[0])


def prove(spec: FieldSpec, multilinears: list, transcript: Transcript,
          challenge_names: list[str]) -> tuple[int, SumcheckProof]:
    """Returns (claimed_sum, proof).  One challenge name per variable."""
    ms = list(multilinears)
    deg = len(ms)
    v = ms[0].shape[1].bit_length() - 1
    assert all(m.shape[1] == 1 << v for m in ms)
    claimed = _to_int(spec, hypercube_sum(spec, _eval_products(spec, ms)))
    rounds = []
    q = spec.modulus
    for rnd in range(v):
        # univariate g(t) = sum_rest prod_j [(1-t) M_j0 + t M_j1](rest)
        evals = []
        for t in range(deg + 1):
            folded = [fold(spec, m, t) for m in ms]
            evals.append(_to_int(spec, hypercube_sum(spec, _eval_products(spec, folded))))
        rounds.append(evals)
        name = challenge_names[rnd]
        for e in evals:
            transcript.bind(name, e.to_bytes(spec.bytes, "big"))
        r = transcript.challenge_scalar(name, q)
        ms = [fold(spec, m, r) for m in ms]
    final = [_to_int(spec, m) for m in ms]
    return claimed, SumcheckProof(round_polys=rounds, final_evals=final)


def _lagrange_eval(pf: PF, ys: list[int], x: int) -> int:
    """Evaluate the degree-(len(ys)-1) polynomial through (i, ys[i]) at x."""
    n = len(ys)
    total = 0
    for i in range(n):
        num, den = 1, 1
        for j in range(n):
            if i != j:
                num = num * (x - j) % pf.q
                den = den * (i - j) % pf.q
        total = (total + ys[i] * num * pf.inv(den)) % pf.q
    return total


def verify(spec: FieldSpec, claimed: int, proof: SumcheckProof,
           transcript: Transcript, challenge_names: list[str],
           final_oracle=None) -> bool:
    """Checks g_i(0)+g_i(1) == previous claim and the final evaluation.
    final_oracle(rs) -> expected prod_j M_j(rs); if None, uses
    proof.final_evals (then the caller must check them separately)."""
    pf = PF(spec.modulus)
    cur = claimed % spec.modulus
    rs = []
    for rnd, evals in enumerate(proof.round_polys):
        if (evals[0] + evals[1]) % spec.modulus != cur:
            return False
        name = challenge_names[rnd]
        for e in evals:
            transcript.bind(name, e.to_bytes(spec.bytes, "big"))
        r = transcript.challenge_scalar(name, spec.modulus)
        rs.append(r)
        cur = _lagrange_eval(pf, evals, r)
    if final_oracle is not None:
        expected = final_oracle(rs) % spec.modulus
    else:
        expected = 1
        for e in proof.final_evals:
            expected = expected * e % spec.modulus
    return cur == expected
