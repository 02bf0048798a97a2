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


def test_msm_checkpointed_resume(setup, tmp_path):
    """Chunked checkpointed MSM equals one-shot MSM, including across a
    simulated kill: run the first chunks, "crash", resume from the state
    file, and compare (SURVEY §5 checkpoint/resume, net-new for TPU)."""
    from gnark_crypto_tpu.msm.checkpoint import msm_checkpointed

    cs, pts, scalars = setup
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    want = point.affine_to_ints(cs, point.jac_to_affine(cs, msm(cs, base, s, c=8)))

    state = str(tmp_path / "msm.ckpt")
    # full run (n=128, chunk=2^5 -> 4 chunks), exact path on CPU
    got = msm_checkpointed(cs, base, s, state, c=8, chunk_log2=5,
                          use_fast=False)
    assert point.affine_to_ints(cs, point.jac_to_affine(cs, got)).item() \
        == want.item()
    assert not (tmp_path / "msm.ckpt").exists()

    # interrupted run: process 2 of 4 chunks by running a half-size job's
    # chunks manually through the same API, then resume
    class _Stop(Exception):
        pass

    calls = 0
    orig = point.jac_add

    def counting(cs_, a, b):
        nonlocal calls
        calls += 1
        if calls == 2:
            raise _Stop()
        return orig(cs_, a, b)

    point.jac_add = counting
    try:
        import gnark_crypto_tpu.msm.checkpoint as ck
        ck.point.jac_add = counting
        with pytest.raises(_Stop):
            msm_checkpointed(cs, base, s, state, c=8, chunk_log2=5,
                             use_fast=False)
    finally:
        point.jac_add = orig
        import gnark_crypto_tpu.msm.checkpoint as ck
        ck.point.jac_add = orig
    import os
    assert os.path.exists(state)  # chunks completed before the "crash"

    got = msm_checkpointed(cs, base, s, state, c=8, chunk_log2=5,
                          use_fast=False)
    assert point.affine_to_ints(cs, point.jac_to_affine(cs, got)).item() \
        == want.item()
    assert not os.path.exists(state)

    # mismatched job shape is refused
    from gnark_crypto_tpu.msm.checkpoint import _save_state
    _save_state(state, 5, 999, 1,
                tuple(np.zeros(cs.fp.n_limbs, np.uint32) for _ in range(3)))
    with pytest.raises(ValueError):
        msm_checkpointed(cs, base, s, state, c=8, chunk_log2=5,
                         use_fast=False)
