"""Fused Pallas point-kernel parity (curves/pallas_point.py) vs the composed
group law of curves/point.py, in interpret mode on the CPU mesh.

Marked slow: interpret-mode compile of the fully fused complete-add kernel is
a very large XLA graph.  The fast-tier coverage of the same kernels is
tests/test_kernel_lang.py (per-op parity) + the TPU oracle runs."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import bn254, pallas_point, point

pytestmark = pytest.mark.slow


def test_fused_jac_add_double_parity():
    cs = bn254()
    rng = np.random.default_rng(3)
    n = 8
    G = cs.generator
    pts1 = [cs.ref.mul(int(rng.integers(1, 2**60)), G) for _ in range(n)]
    pts2 = [cs.ref.mul(int(rng.integers(1, 2**60)), G) for _ in range(n)]
    pts2[0] = pts1[0]                                   # doubling case
    pts2[1] = (pts1[1][0], cs.fp.modulus - pts1[1][1])  # P + (-P) = inf
    pts1[2] = None                                      # inf + Q
    pts2[3] = None                                      # P + inf
    pts1[4] = None
    pts2[4] = None                                      # inf + inf

    j1 = point.jac_from_affine(cs, point.affine_from_ints(cs, pts1))
    j2 = point.jac_from_affine(cs, point.affine_from_ints(cs, pts2))
    j1 = point.jac_double(cs, j1)  # non-trivial Z on one side

    out = pallas_point.jac_add(cs, j1.x, j1.y, j1.z, j2.x, j2.y, j2.z,
                               n, True)
    got = point.affine_to_ints(cs, point.jac_to_affine(cs, point.Jac(*out)))
    want = point.affine_to_ints(cs, point.jac_to_affine(cs, point.jac_add(cs, j1, j2)))
    assert (got == want).all()

    outd = pallas_point.jac_double(cs, j1.x, j1.y, j1.z, n, True)
    gotd = point.affine_to_ints(cs, point.jac_to_affine(cs, point.Jac(*outd)))
    wantd = point.affine_to_ints(cs, point.jac_to_affine(cs, point.jac_double(cs, j1)))
    assert (gotd == wantd).all()
