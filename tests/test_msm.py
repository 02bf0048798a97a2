"""MSM vs oracle (mirrors multiexp_test.go: result equals naive sum)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import bn254, point
from gnark_crypto_tpu.msm import msm


@pytest.fixture(scope="module")
def setup():
    cs = bn254()
    rng = np.random.default_rng(0)
    n = 128
    G = cs.generator
    pts = [cs.ref.mul(int(rng.integers(1, 2**60)), G) for _ in range(n)]
    scalars = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % cs.fr.modulus
               for _ in range(n)]
    scalars[0] = 0
    scalars[1] = cs.fr.modulus - 1
    return cs, pts, scalars


def test_msm_small_windows(setup):
    cs, pts, scalars = setup
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    want = cs.ref.msm(scalars, pts)
    for c in (5, 9):
        got = point.affine_to_ints(cs, point.jac_to_affine(cs, msm(cs, base, s, c=c)))
        assert got.item() == want, f"msm mismatch at c={c}"


def test_msm_all_same_bucket(setup):
    """Adversarial: every scalar identical -> one bucket holds all points
    (exercises the overflow->retry path)."""
    cs, pts, _ = setup
    base = point.affine_from_ints(cs, pts)
    k = 7
    scalars = [k] * len(pts)
    s = point.scalars_from_ints(cs, scalars)
    got = point.affine_to_ints(cs, point.jac_to_affine(cs, msm(cs, base, s, c=8)))
    want = cs.ref.msm(scalars, pts)
    assert got.item() == want
