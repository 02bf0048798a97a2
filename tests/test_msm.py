"""MSM vs oracle (mirrors multiexp_test.go: result equals naive sum).

The segmented-scan bucket accumulation must be exact for ANY scalar
distribution (multiexp.go:213-301 handles any input); the adversarial cases
here are the distributions that broke static-capacity designs: all-equal
scalars (one bucket holds every point) and low-entropy 126-bit scalars
(carry-only windows)."""

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


def _run(cs, pts, scalars, c):
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    return point.affine_to_ints(cs, point.jac_to_affine(cs, msm(cs, base, s, c=c)))


def test_msm_small_windows(setup):
    cs, pts, scalars = setup
    want = cs.ref.msm(scalars, pts)
    for c in (5, 9):
        got = _run(cs, pts, scalars, c)
        assert got.item() == want, f"msm mismatch at c={c}"


def test_msm_all_same_bucket(setup):
    """Adversarial: every scalar identical -> one bucket holds all points."""
    cs, pts, _ = setup
    scalars = [7] * len(pts)
    got = _run(cs, pts, scalars, c=8)
    want = cs.ref.msm(scalars, pts)
    assert got.item() == want


def test_msm_low_entropy_scalars(setup):
    """Adversarial: 126-bit scalars -> top windows are carry-only (the
    round-2 bench failure distribution) plus duplicate points."""
    cs, pts, _ = setup
    rng = np.random.default_rng(7)
    pts = list(pts)
    pts[3] = pts[2]
    pts[4] = pts[2]
    scalars = [int(a) * int(b) % cs.fr.modulus
               for a, b in zip(rng.integers(1, 2**63, len(pts)),
                               rng.integers(1, 2**63, len(pts)))]
    got = _run(cs, pts, scalars, c=9)
    want = cs.ref.msm(scalars, pts)
    assert got.item() == want


def test_msm_non_pow2_and_chunked(setup):
    """Non-power-of-two n (padding path) and chunk smaller than n (the
    carried-boundary path of the within-window chunk scan)."""
    cs, pts, scalars = setup
    pts, scalars = pts[:100], scalars[:100]
    want = cs.ref.msm(scalars, pts)
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    got = point.affine_to_ints(
        cs, point.jac_to_affine(cs, msm(cs, base, s, c=6, chunk=16))
    )
    assert got.item() == want
