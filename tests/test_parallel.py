"""Multi-chip paths on the 8-device CPU mesh (the reference has no distributed
layer to mirror — SURVEY.md §2.8; these validate the net-new mesh design)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curves import bn254, point
from gnark_crypto_tpu.fields import get_spec, mont
from gnark_crypto_tpu.parallel import make_mesh, msm_sharded, ntt_sharded, shard_batch
from gnark_crypto_tpu.fft import Domain, ntt


def test_ntt_sharded_matches_single():
    spec = get_spec("babybear")
    n = 256
    rng = np.random.default_rng(0)
    vals = [int(v) % spec.modulus for v in rng.integers(0, 2**62, n)]
    a = mont.from_ints(spec, vals)
    mesh = make_mesh(4)
    got = ntt_sharded(spec, mesh, a, log2_rows=4)
    want = ntt(Domain(spec, n), a)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_msm_sharded_matches_oracle():
    cs = bn254()
    rng = np.random.default_rng(1)
    n = 64
    G = cs.generator
    pts = [cs.ref.mul(int(rng.integers(1, 2**60)), G) for _ in range(n)]
    scalars = [int(rng.integers(0, 2**63)) % cs.fr.modulus for _ in range(n)]
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    mesh = make_mesh(4)
    base = point.Affine(shard_batch(mesh, base.x), shard_batch(mesh, base.y))
    s = shard_batch(mesh, s)
    got_jac = msm_sharded(cs, mesh, base, s, c=6)
    got = point.affine_to_ints(cs, point.jac_to_affine(cs, got_jac))
    want = cs.ref.msm(scalars, pts)
    assert got.item() == want


@pytest.mark.slow
def test_msm_sharded_2d_matches_oracle():
    """window x data 2-D mesh layout (parallel/MSM_LAYOUT.md)."""
    from gnark_crypto_tpu.parallel import make_mesh_2d, msm_sharded_2d

    cs = bn254()
    rng = np.random.default_rng(2)
    n = 64
    G = cs.generator
    pts = [cs.ref.mul(int(rng.integers(1, 2**60)), G) for _ in range(n)]
    scalars = [int(rng.integers(0, 2**63)) % cs.fr.modulus for _ in range(n)]
    base = point.affine_from_ints(cs, pts)
    s = point.scalars_from_ints(cs, scalars)
    mesh = make_mesh_2d(2, 4)
    base = point.Affine(
        shard_batch(mesh, base.x), shard_batch(mesh, base.y)
    )
    s = shard_batch(mesh, s)
    got_jac = msm_sharded_2d(cs, mesh, base, s, c=6)
    got = point.affine_to_ints(cs, point.jac_to_affine(cs, got_jac))
    want = cs.ref.msm(scalars, pts)
    assert got.item() == want
