"""GKR prover/verifier for layered add/mul arithmetic circuits.

Mirrors ecc/bn254/fr/gkr/gkr.go (Gate/Wire/Circuit :25-36, eq-weighted
sumcheck claims :143-347, Prove/Verify :509-557) in protocol structure:

- per layer, the claim V~_i(q) reduces through a sumcheck over (x, y) of
  add~(q,x,y)(V(x)+V(y)) + mul~(q,x,y)V(x)V(y);
- the two endpoint claims V(rx), V(ry) are aggregated by a random linear
  combination into the next layer's claim (the claims-manager role);
- challenges run through the Fiat-Shamir transcript.

TPU shape: the x-phase tracks y-reduced tables (A1, A2, M1 — multilinear in
x), the y-phase the x-bound slices; every round is a batched fold
(multilin.fold) + hypercube sum on device.  Wiring-predicate tables are dense
over (x, y) — O(4^k) per layer — fine for the moderate layer widths GKR is
used with in-circuit; the reference keeps them sparse (gkr.go:143)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..fiatshamir.transcript import Transcript
from ..fields import mont
from ..fields.reference import PF
from ..fields.spec import FieldSpec
from .multilin import eq_table, fold, hypercube_sum


@dataclasses.dataclass(frozen=True)
class Gate:
    op: str        # 'add' | 'mul'
    in0: int       # wire index in next (input-side) layer
    in1: int


@dataclasses.dataclass(frozen=True)
class Layer:
    gates: tuple   # one Gate per output wire (len = 2^k_out)


@dataclasses.dataclass(frozen=True)
class Circuit:
    layers: tuple  # output layer first; inputs feed the last layer


def evaluate_circuit(spec: FieldSpec, circuit: Circuit, inputs: list[int]):
    """Returns per-layer wire values (host ints), input layer last."""
    pf = PF(spec.modulus)
    values = [list(inputs)]
    for layer in reversed(circuit.layers):
        prev = values[0]
        out = []
        for g in layer.gates:
            if g.op == "add":
                out.append(pf.add(prev[g.in0], prev[g.in1]))
            else:
                out.append(pf.mul(prev[g.in0], prev[g.in1]))
        values.insert(0, out)
    return values  # values[0] = outputs ... values[-1] = inputs


def _mle_eval(pf: PF, vals: list[int], rs: list[int]) -> int:
    cur = [v % pf.q for v in vals]
    for r in rs:
        half = len(cur) // 2
        cur = [(cur[i] + r * (cur[i + half] - cur[i])) % pf.q for i in range(half)]
    return cur[0]


def _predicate_tables(spec, layer: Layer, q_weights):
    """Dense Add_q[x,y], Mul_q[x,y] with Add_q = sum_g w[z_g] 1[x=x_g,y=y_g];
    q_weights: device eq-table over output wires (n_limbs, 2^k_out)."""
    n_in = 1
    for g in layer.gates:
        n_in = max(n_in, g.in0 + 1, g.in1 + 1)
    k_in = max(1, (n_in - 1).bit_length())
    n_in = 1 << k_in
    add_slots, mul_slots, add_idx, mul_idx = [], [], [], []
    for z, g in enumerate(layer.gates):
        slot = g.in0 * n_in + g.in1
        (add_idx if g.op == "add" else mul_idx).append(z)
        (add_slots if g.op == "add" else mul_slots).append(slot)
    f = spec

    # duplicate (x,y) pairs across gates must accumulate mod q — group the
    # (static) gate list host-side and combine with mont adds
    def build_exact(zs, slots):
        tab = mont.zeros(f, (n_in * n_in,))
        if not zs:
            return tab
        w = q_weights[:, jnp.asarray(zs)]
        # accumulate duplicates with mont adds host-side grouping (gate lists
        # are static): group slots
        groups: dict[int, list[int]] = {}
        for i, s in enumerate(slots):
            groups.setdefault(s, []).append(i)
        cols, pieces = [], []
        for s, idxs in groups.items():
            acc = w[:, idxs[0]]
            for i in idxs[1:]:
                acc = mont.add(f, acc[:, None], w[:, i][:, None])[:, 0]
            cols.append(s)
            pieces.append(acc)
        tab = tab.at[:, jnp.asarray(cols)].set(jnp.stack(pieces, axis=1))
        return tab

    add_tab = build_exact(add_idx, add_slots)
    mul_tab = build_exact(mul_idx, mul_slots)
    return (add_tab.reshape(f.n_limbs, n_in, n_in),
            mul_tab.reshape(f.n_limbs, n_in, n_in), k_in)


def _pred_eval_host(pf: PF, layer: Layer, q_weights_host, rx, ry, k_in):
    """add~ / mul~ at (q, rx, ry) from the sparse gate list (verifier side)."""
    def eqv(point, idx, k):
        out = 1
        for i in range(k):
            bit = (idx >> (k - 1 - i)) & 1
            out = out * (point[i] if bit else (1 - point[i])) % pf.q
        return out

    a = m = 0
    for z, g in enumerate(layer.gates):
        wz = q_weights_host[z]
        t = wz * eqv(rx, g.in0, k_in) % pf.q * eqv(ry, g.in1, k_in) % pf.q
        if g.op == "add":
            a = (a + t) % pf.q
        else:
            m = (m + t) % pf.q
    return a, m


def _to_int(spec, v):
    return int(mont.to_ints(spec, v[:, None])[0])


def _round_evals(spec, arrays, combine, npts):
    out = []
    for t in range(npts):
        folded = [fold(spec, a, t) for a in arrays]
        out.append(_to_int(spec, hypercube_sum(spec, combine(folded))))
    return out


@dataclasses.dataclass
class GkrProof:
    layer_proofs: list   # per layer: (round_polys, claim_vx, claim_vy)


def prove(spec: FieldSpec, circuit: Circuit, inputs: list[int],
          transcript: Transcript) -> tuple[list[int], GkrProof]:
    pf = PF(spec.modulus)
    q = spec.modulus
    values = evaluate_circuit(spec, circuit, inputs)
    outputs = values[0]
    k_out = max(1, (len(outputs) - 1).bit_length())
    # initial claim: V~_0 at random q0
    name0 = "gkr_q0"
    transcript.bind(name0, b"".join(int(v).to_bytes(spec.bytes, "big")
                                    for v in outputs))
    q0 = [transcript.challenge_scalar(name0, q)]
    while len(q0) < k_out:
        q0.append(int.from_bytes(
            bytes([len(q0)]) + q0[0].to_bytes(spec.bytes, "big"), "big") % q)
    # claim weights over output wires: eq(q0, z)
    weights = eq_table(spec, q0)
    layer_proofs = []
    rnd_counter = 0
    for li, layer in enumerate(circuit.layers):
        vin = values[li + 1]
        add_t, mul_t, k_in = _predicate_tables(spec, layer, weights)
        n_in = 1 << k_in
        vx = mont.from_ints(spec, (vin + [0] * n_in)[:n_in])
        vy = vx
        # x-phase reduced tables over x: A1 = sum_y A, A2 = sum_y A*Vy,
        # M1 = sum_y M*Vy
        A = add_t   # (n_limbs, x, y)
        M = mul_t
        A1 = mont.sum_axis(spec, A, axis=2)
        A2 = mont.sum_axis(spec, mont.mul(spec, A, vy[:, None, :]), axis=2)
        M1 = mont.sum_axis(spec, mont.mul(spec, M, vy[:, None, :]), axis=2)
        rounds = []
        rx = []
        Vx = vx
        for _ in range(k_in):
            def comb(fs):
                Vx_, A1_, A2_, M1_ = fs
                return mont.add(
                    spec,
                    mont.mul(spec, Vx_, mont.add(spec, A1_, M1_)),
                    A2_,
                )

            # flatten (x,y) tables for folding on axis 1: A/M fold over x too
            evs = _round_evals(spec, [Vx, A1, A2, M1],
                               lambda fs: comb(fs), 3)
            name = f"gkr_r{rnd_counter}"
            rnd_counter += 1
            transcript.order.append(name)
            transcript.bindings[name] = []
            for e in evs:
                transcript.bind(name, e.to_bytes(spec.bytes, "big"))
            r = transcript.challenge_scalar(name, q)
            rx.append(r)
            rounds.append(evs)
            Vx = fold(spec, Vx, r)
            A1 = fold(spec, A1, r)
            A2 = fold(spec, A2, r)
            M1 = fold(spec, M1, r)
            A = fold(spec, A, r)  # (n_limbs, x, y): binds an x variable
            M = fold(spec, M, r)
        vx_star = _to_int(spec, Vx[:, 0])
        # y-phase: A_r(y) = A[0? x fully bound] (n_limbs, 1, n_in)
        Ay = A.reshape(spec.n_limbs, n_in)
        My = M.reshape(spec.n_limbs, n_in)
        Vy = vy
        vxc = mont.const(spec, vx_star, (1,))
        ry = []
        for _ in range(k_in):
            def comby(fs):
                Vy_, Ay_, My_ = fs
                term = mont.mul(spec, Ay_, mont.add(spec, Vy_, vxc))
                term2 = mont.mul(spec, My_, mont.mul(spec, Vy_, vxc))
                return mont.add(spec, term, term2)

            evs = _round_evals(spec, [Vy, Ay, My], comby, 3)
            name = f"gkr_r{rnd_counter}"
            rnd_counter += 1
            transcript.order.append(name)
            transcript.bindings[name] = []
            for e in evs:
                transcript.bind(name, e.to_bytes(spec.bytes, "big"))
            r = transcript.challenge_scalar(name, q)
            ry.append(r)
            rounds.append(evs)
            Vy = fold(spec, Vy, r)
            Ay = fold(spec, Ay, r)
            My = fold(spec, My, r)
        vy_star = _to_int(spec, Vy[:, 0])
        layer_proofs.append((rounds, vx_star, vy_star))
        # aggregate claims for next layer: alpha*V(rx) + beta*V(ry)
        if li + 1 < len(circuit.layers) or True:
            name = f"gkr_agg{li}"
            transcript.order.append(name)
            transcript.bindings[name] = []
            transcript.bind(name, vx_star.to_bytes(spec.bytes, "big"))
            transcript.bind(name, vy_star.to_bytes(spec.bytes, "big"))
            alpha = transcript.challenge_scalar(name, q)
            beta = (alpha * alpha) % q
            ex = eq_table(spec, rx)
            ey = eq_table(spec, ry)
            weights = mont.add(
                spec,
                mont.mul(spec, mont.const(spec, alpha, (1,)), ex),
                mont.mul(spec, mont.const(spec, beta, (1,)), ey),
            )
    return outputs, GkrProof(layer_proofs=layer_proofs)


def verify(spec: FieldSpec, circuit: Circuit, inputs: list[int],
           outputs: list[int], proof: GkrProof, transcript: Transcript) -> bool:
    pf = PF(spec.modulus)
    q = spec.modulus
    k_out = max(1, (len(outputs) - 1).bit_length())
    name0 = "gkr_q0"
    transcript.bind(name0, b"".join(int(v).to_bytes(spec.bytes, "big")
                                    for v in outputs))
    q0 = [transcript.challenge_scalar(name0, q)]
    while len(q0) < k_out:
        q0.append(int.from_bytes(
            bytes([len(q0)]) + q0[0].to_bytes(spec.bytes, "big"), "big") % q)
    n_out = 1 << k_out
    claim = _mle_eval(pf, (list(outputs) + [0] * n_out)[:n_out], q0)
    # host weights: w[z] = coefficient applied to wire z of current layer
    def eq_weights_host(points_scales):
        n = None
        out = None
        for rs, sc in points_scales:
            k = len(rs)
            n = 1 << k
            vals = []
            for z in range(n):
                t = sc
                for i in range(k):
                    bit = (z >> (k - 1 - i)) & 1
                    t = t * (rs[i] if bit else (1 - rs[i])) % q
                vals.append(t)
            out = vals if out is None else [(a + b) % q for a, b in zip(out, vals)]
        return out

    weight_spec = [(q0, 1)]
    rnd_counter = 0
    for li, layer in enumerate(circuit.layers):
        rounds, vx_star, vy_star = proof.layer_proofs[li]
        n_in = 1
        for g in layer.gates:
            n_in = max(n_in, g.in0 + 1, g.in1 + 1)
        k_in = max(1, (n_in - 1).bit_length())
        cur = claim
        rs = []
        for rounds_idx, evs in enumerate(rounds):
            if (evs[0] + evs[1]) % q != cur:
                return False
            name = f"gkr_r{rnd_counter}"
            rnd_counter += 1
            transcript.order.append(name)
            transcript.bindings[name] = []
            for e in evs:
                transcript.bind(name, e.to_bytes(spec.bytes, "big"))
            r = transcript.challenge_scalar(name, q)
            rs.append(r)
            # degree-2 Lagrange through t=0,1,2 at r
            l0 = (r - 1) * (r - 2) % q * pf.inv(2) % q
            l1 = r * (r - 2) % q * pf.inv(q - 1) % q
            l2 = r * (r - 1) % q * pf.inv(2) % q
            cur = (evs[0] * l0 + evs[1] * l1 + evs[2] * l2) % q
        rx, ry = rs[:k_in], rs[k_in:]
        wh = eq_weights_host(weight_spec)
        a_t, m_t = _pred_eval_host(pf, layer, wh, rx, ry, k_in)
        expected = (a_t * ((vx_star + vy_star) % q) + m_t * vx_star % q * vy_star) % q
        if expected != cur:
            return False
        name = f"gkr_agg{li}"
        transcript.order.append(name)
        transcript.bindings[name] = []
        transcript.bind(name, vx_star.to_bytes(spec.bytes, "big"))
        transcript.bind(name, vy_star.to_bytes(spec.bytes, "big"))
        alpha = transcript.challenge_scalar(name, q)
        beta = (alpha * alpha) % q
        claim = (alpha * vx_star + beta * vy_star) % q
        weight_spec = [(rx, alpha), (ry, beta)]
    # final: claims against the input layer (known to the verifier)
    n_in = 1 << max(1, (len(inputs) - 1).bit_length())
    padded = (list(inputs) + [0] * n_in)[:n_in]
    rx, ry = weight_spec[0][0], weight_spec[1][0]
    alpha, beta = weight_spec[0][1], weight_spec[1][1]
    want = (alpha * _mle_eval(pf, padded, rx) + beta * _mle_eval(pf, padded, ry)) % q
    return want == claim
