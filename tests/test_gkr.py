"""GKR prover/verifier roundtrip on small layered circuits."""

import numpy as np
import pytest

from gnark_crypto_tpu.fiatshamir.transcript import Transcript
from gnark_crypto_tpu.fields import get_spec
from gnark_crypto_tpu.protocols.gkr import (
    Circuit,
    Gate,
    GkrProof,
    Layer,
    evaluate_circuit,
    prove,
    verify,
)


def _t():
    return Transcript("sha256", ["gkr_q0"])


@pytest.fixture(scope="module")
def spec():
    return get_spec("bn254_fr")


def test_single_layer_mul(spec):
    # outputs: [a*b, c+d]
    circuit = Circuit(layers=(
        Layer(gates=(Gate("mul", 0, 1), Gate("add", 2, 3))),
    ))
    inputs = [3, 5, 7, 11]
    outputs, proof = prove(spec, circuit, inputs, _t())
    assert outputs == [15, 18]
    assert verify(spec, circuit, inputs, outputs, proof, _t())
    assert not verify(spec, circuit, inputs, [16, 18], proof, _t())


def test_two_layer_circuit(spec):
    rng = np.random.default_rng(0)
    # layer 1 (inputs 4 wires): h = [i0*i1, i2+i3, i0+i2, i1*i3]
    # layer 0 (outputs 2 wires): [h0+h1, h2*h3]
    circuit = Circuit(layers=(
        Layer(gates=(Gate("add", 0, 1), Gate("mul", 2, 3))),
        Layer(gates=(Gate("mul", 0, 1), Gate("add", 2, 3),
                     Gate("add", 0, 2), Gate("mul", 1, 3))),
    ))
    inputs = [int(x) % spec.modulus for x in rng.integers(1, 2**61, 4)]
    vals = evaluate_circuit(spec, circuit, inputs)
    outputs, proof = prove(spec, circuit, inputs, _t())
    assert outputs == vals[0]
    assert verify(spec, circuit, inputs, outputs, proof, _t())
    # tamper with a sumcheck round
    lp = proof.layer_proofs
    r0 = ([[(lp[0][0][0][0] + 1) % spec.modulus] + lp[0][0][0][1:]]
          + lp[0][0][1:], lp[0][1], lp[0][2])
    bad = GkrProof(layer_proofs=[r0] + lp[1:])
    assert not verify(spec, circuit, inputs, outputs, bad, _t())
