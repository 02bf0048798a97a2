"""Reference-format GKR verifier: checks gnark's own test vectors.

The reference pins its GKR implementation with JSON vectors
(internal/generator/gkr/test_vectors/*.json): a circuit (wire list with
gates), per-instance inputs/outputs, and a full proof (per-wire sumcheck
partialSumPolys + finalEvalProof) generated under a mock "const" Fiat-Shamir
hash whose every draw is the same constant (test_vector_utils.go:38
MessageCounter with step=0).  This module re-implements the VERIFIER side of
gnark's protocol exactly (gkr.go:635 Verify, gkr.go:96 VerifyFinalEval,
sumcheck/sumcheck.go:125 Verify) over host big ints, so those vectors pin
our understanding of the protocol byte-for-byte:

- all transcript challenges equal the mock constant (-1 in the vectors);
- a wire's combined claim is CombinedSum(a) = sum_j value_j * a^j;
- each sumcheck round sends [g(1), ..., g(deg)] with g(0) = claim - g(1),
  deg = 1 + gate degree; the next claim is g(r) by Lagrange interpolation
  on the range points 0..deg;
- VerifyFinalEval combines eq(point_i, r) Horner-style in reverse claim
  order, dedups shared input wires in finalEvalProof, and compares
  eq * Gate(inputEvals) with the last sumcheck claim;
- single-claim input wires carry no proof: the verifier evaluates the input
  multilinear extension directly.

The gate registry mirrors gkr.go:857 and the test-only gates of
gkr_test.go:559 (mimc cipher gate (x0+x1)^7 with zero ark, select-input-3).
"""

from __future__ import annotations

GATES = {
    "identity": (1, lambda ins, q: ins[0] % q),
    "add": (1, lambda ins, q: (ins[0] + ins[1]) % q),
    "mul": (2, lambda ins, q: ins[0] * ins[1] % q),
    "sub": (1, lambda ins, q: (ins[0] - ins[1]) % q),
    "neg": (1, lambda ins, q: (-ins[0]) % q),
    "mimc": (7, lambda ins, q: pow((ins[0] + ins[1]) % q, 7, q)),
    "select-input-3": (1, lambda ins, q: ins[2] % q),
}


def _mle_eval(vals, rs, q: int) -> int:
    """Multilinear extension of vals (len 2^len(rs)) at point rs."""
    cur = [v % q for v in vals]
    for r in rs:
        cur = [(a * (1 - r) + b * r) % q
               for a, b in zip(cur[0::2], cur[1::2])]
    assert len(cur) == 1
    return cur[0]


def _eval_eq(xs, ys, q: int) -> int:
    """polynomial.EvalEq: prod_i (x y + (1-x)(1-y))."""
    out = 1
    for x, y in zip(xs, ys):
        out = out * ((x * y + (1 - x) * (1 - y)) % q) % q
    return out


def _interp_eval(ys, x: int, q: int) -> int:
    """Value at x of the polynomial through points (i, ys[i]), i = 0..d."""
    d = len(ys) - 1
    out = 0
    for i, yi in enumerate(ys):
        num, den = 1, 1
        for j in range(d + 1):
            if j != i:
                num = num * ((x - j) % q) % q
                den = den * ((i - j) % q) % q
        out = (out + yi * num % q * pow(den, -1, q)) % q
    return out


def verify_reference_vector(q: int, circuit: list, inputs: list,
                            outputs: list, proof: list,
                            challenge: int = -1) -> bool:
    """circuit: [(gate_name_or_None, [input wire idxs])]; inputs/outputs:
    per-wire per-instance int rows; proof: per-wire dicts with
    'partialSumPolys' and 'finalEvalProof'.  Returns True iff the proof
    verifies under gnark's protocol with every challenge == `challenge`."""
    chal = challenge % q
    n_wires = len(circuit)
    nb_inst = len(inputs[0])
    nv = nb_inst.bit_length() - 1
    assert 1 << nv == nb_inst

    consumers = [0] * n_wires
    for g, gins in circuit:
        for w in set(gins):
            consumers[w] += 1
    in_wires = [i for i, (g, _) in enumerate(circuit) if g is None]
    out_wires = [i for i in range(n_wires) if consumers[i] == 0]
    assignment = {w: list(map(int, inputs[k]))
                  for k, w in enumerate(in_wires)}

    claims: dict = {i: [] for i in range(n_wires)}
    first = [chal] * nv
    for k, wo in enumerate(out_wires):
        claims[wo].append((first, _mle_eval(outputs[k], first, q)))

    for i in reversed(range(n_wires)):
        gate, gins = circuit[i]
        cl = claims[i]
        pw = proof[i]
        psp = [[int(v) % q for v in row] for row in pw["partialSumPolys"]]
        fep = [int(v) % q for v in pw["finalEvalProof"]]
        if gate is None and len(cl) <= 1:
            if psp or fep:
                return False          # no proof allowed (gkr.go:661)
            if cl:
                pt, v = cl[0]
                if _mle_eval(assignment[i], pt, q) != v:
                    return False      # incorrect input wire claim
            continue
        # sumcheck (sumcheck.go:125)
        k = len(cl)
        coeff = chal if k >= 2 else 0
        s = 0
        for v in reversed([v for _, v in cl]):
            s = (s * coeff + v) % q   # CombinedSum: sum v_j coeff^j
        deg = 1 + (GATES[gate][0] if gate is not None else 1)
        if len(psp) != nv:
            return False
        r = []
        for j in range(nv):
            e = psp[j]
            if len(e) != deg:
                return False          # malformed proof
            g_evals = [(s - e[0]) % q] + e
            rj = chal
            r.append(rj)
            s = _interp_eval(g_evals, rj, q)
        # VerifyFinalEval (gkr.go:96)
        evaluation = _eval_eq(cl[-1][0], r, q)
        for idx in range(k - 2, -1, -1):
            evaluation = (evaluation * coeff + _eval_eq(cl[idx][0], r, q)) % q
        if gate is None:
            gate_eval = _mle_eval(assignment[i], r, q)
            if fep:
                return False
        else:
            idx_of: dict = {}
            input_evals = []
            for w in gins:
                if w not in idx_of:
                    if len(idx_of) >= len(fep):
                        return False
                    idx_of[w] = len(idx_of)
                    claims[w].append((r, fep[idx_of[w]]))
                input_evals.append(fep[idx_of[w]])
            if len(idx_of) != len(fep):
                return False
            gate_eval = GATES[gate][1](input_evals, q)
        if evaluation * gate_eval % q != s:
            return False
    return True


def evaluate_circuit(q: int, circuit: list, inputs: list) -> list:
    """Per-instance wire values for the non-input wires, in circuit order."""
    n_inst = len(inputs[0])
    vals: dict = {}
    k = 0
    for i, (g, gins) in enumerate(circuit):
        if g is None:
            vals[i] = [int(v) % q for v in inputs[k]]
            k += 1
        else:
            vals[i] = [GATES[g][1]([vals[w][t] for w in gins], q)
                       for t in range(n_inst)]
    return vals
