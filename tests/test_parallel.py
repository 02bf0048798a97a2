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


@pytest.mark.slow
def test_msm_sharded_scale_2e18_matches_single():
    """2^18-point sharded MSM on the full 8-device CPU mesh vs the
    single-device exact path (VERDICT r04 #8: multichip evidence at scale,
    bit-equality asserted)."""
    from gnark_crypto_tpu.msm.msm import msm

    cs = bn254()
    n = 1 << 18
    rng = np.random.default_rng(5)
    # synthetic-but-valid points: tile a small batch of true curve points
    n_base = 64
    G = cs.generator
    base_pts = [cs.ref.mul(int(k), G) for k in rng.integers(1, 2**60, n_base)]
    base = point.affine_from_ints(cs, base_pts)
    reps = n // n_base
    px = np.tile(np.asarray(base.x), (1, reps))
    py = np.tile(np.asarray(base.y), (1, reps))
    limbs = rng.integers(0, 1 << 16, size=(cs.fr.n_limbs, n), dtype=np.uint32)
    pts = point.Affine(px, py)
    want = msm(cs, point.Affine(np.asarray(px), np.asarray(py)),
               np.asarray(limbs), c=12)
    want_a = point.affine_to_ints(cs, point.jac_to_affine(cs, want)).item()

    mesh = make_mesh(8)
    spts = point.Affine(shard_batch(mesh, px), shard_batch(mesh, py))
    s = shard_batch(mesh, limbs)
    got = msm_sharded(cs, mesh, spts, s, c=12)
    got_a = point.affine_to_ints(cs, point.jac_to_affine(cs, got)).item()
    assert got_a == want_a


@pytest.mark.slow
def test_ntt_four_step_scale_2e20_matches_single():
    """2^20 four-step NTT on the 8-device CPU mesh vs the plain device NTT
    (VERDICT r04 #8), bit-equality asserted."""
    spec = get_spec("bn254_fr")
    n = 1 << 20
    rng = np.random.default_rng(6)
    limbs = rng.integers(0, 1 << 16, size=(spec.n_limbs, n), dtype=np.uint32)
    limbs[-1] = rng.integers(
        0, spec.modulus >> (16 * (spec.n_limbs - 1)), size=n, dtype=np.uint32)
    a = np.asarray(limbs)
    want = np.asarray(ntt(Domain(spec, n), a))
    mesh = make_mesh(8)
    got = np.asarray(ntt_sharded(spec, mesh, a, log2_rows=10))
    assert np.array_equal(got, want)
