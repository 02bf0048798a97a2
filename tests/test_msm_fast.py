"""Rounds-based MSM (msm/pallas_msm.py) vs host oracles.

The rounds kernel is the TPU analogue of the reference's conflict-free bucket
batch (multiexp_affine.go:18): these tests drive it in interpret mode (the
purego analogue) over hand-built windows covering every group-law edge the
kernel must select between: empty buckets, masked/sentinel lanes, duplicate
points (doubling), and P + (-P) cancellation — and the full msm_fast glue
(sort-payload + run-copy DMA + rounds kernel) against the exact msm path."""

import dataclasses

import numpy as np
import pytest

import gnark_crypto_tpu.msm.pallas_msm as pm
from gnark_crypto_tpu.curves.reference import RefCurve
from gnark_crypto_tpu.fields import PF, get_spec, mont


@dataclasses.dataclass(frozen=True)
class ToyCurve:
    """Tiny curve over babybear: keeps the (field-generic) rounds kernel's
    interpret-mode compile ~100x smaller than bn254's 16-limb instance."""

    fp: object
    a: int
    b: int
    ref: RefCurve


@pytest.fixture(scope="module")
def cs():
    spec = get_spec("babybear")
    p = spec.modulus
    a, b = 0, 3
    pf = PF(p)
    # find a generator-ish point
    for x in range(1, 100):
        y = pf.sqrt((x * x * x + b) % p)
        if y is not None:
            break
    curve = RefCurve(p, a, b)
    cs = ToyCurve(fp=spec, a=a, b=b, ref=curve)
    cs.ref._gen = (x, y)
    return cs


def _pack_host(f, v: int) -> list:
    """Packed 32-bit rows of a field element's mont limbs."""
    limbs = f.mont_limbs(v)
    n32 = pm._pack_rows(f.n_limbs)
    rows = [0] * n32
    for j, l in enumerate(limbs):
        rows[j // 2] |= int(l) << (16 * (j % 2))
    return rows


def _dense_from_buckets(cs, buckets_pts, nb, P):
    """buckets_pts: list (len <= nb) of lists of host (point, code) entries
    where code 1 = add P, 2 = add -P (kernel negates y).  Builds the dense
    candidate matrix in the ppr=1 kernel layout: (P, 1+2*n32, nb) with the
    key2 row encoding (bucket+1)<<1 | sign."""
    f = cs.fp
    n32 = pm._pack_rows(f.n_limbs)
    R = 1 + 2 * n32
    dense = np.full((P, R, nb), pm._SENTINEL, dtype=np.uint32)
    dense[:, 1:, :] = 0
    for b, pts in enumerate(buckets_pts):
        for r, (pt, cd) in enumerate(pts):
            x, y = pt
            dense[r, 0, b] = ((b + 1) << 1) | (cd == 2)
            dense[r, 1 : 1 + n32, b] = _pack_host(f, x)
            dense[r, 1 + n32 :, b] = _pack_host(f, y)
    return dense


def _coords_to_host(cs, coords, col):
    """Projective (a==0, RCB kernel) or XYZZ coords -> host affine point."""
    f = cs.fp
    p = f.modulus
    ints = [int(mont.to_ints(f, c[:, col : col + 1])[0]) for c in coords]
    if len(ints) == 3:
        xi, yi, zi = ints
        if zi == 0:
            return None
        return (xi * pow(zi, -1, p) % p, yi * pow(zi, -1, p) % p)
    xi, yi, zzi, zzzi = ints
    if zzi == 0:
        return None
    return (xi * pow(zzi, -1, p) % p, yi * pow(zzzi, -1, p) % p)


def test_rounds_kernel_all_cases(cs, monkeypatch):
    monkeypatch.setattr(pm, "BL", 8)
    nb, P = 8, 4
    ref = cs.ref
    G = cs.ref._gen
    pts = [ref.mul(k, G) for k in range(1, 9)]
    buckets = [
        [],                                            # empty bucket
        [(pts[0], 1)],                                 # single point
        [(pts[1], 1), (pts[2], 1), (pts[3], 1)],       # plain chain of adds
        [(pts[4], 1), (pts[4], 1)],                    # duplicate -> doubling
        [(pts[5], 1), (pts[5], 2)],                    # P + (-P) -> infinity
        [(pts[5], 1), (pts[5], 2), (pts[6], 1)],       # resurrect after cancel
        [(pts[7], 2), (pts[7], 2), (pts[7], 2)],       # negated double + add
    ]
    dense = _dense_from_buckets(cs, buckets, nb, P)
    import jax
    import jax.numpy as jnp

    f = cs.fp
    n32 = pm._pack_rows(f.n_limbs)
    aux = jnp.stack([jnp.zeros((nb,), jnp.int32),
                     jnp.full((nb,), P, jnp.int32)])
    fn = jax.jit(lambda d, a: pm._run_rounds(
        f, cs.a, cs.b, f.n_limbs, n32, P, P, True, nb, True, d, a))
    coords = fn(jnp.asarray(dense), aux)
    for b, bucket in enumerate(buckets):
        want = None
        for q, cd in bucket:
            want = ref.add(want, q if cd == 1 else ref.neg(q))
        got = _coords_to_host(cs, coords, b)
        assert got == want, f"bucket {b}: {got} != {want}"


def _jac_to_host(shim, j):
    f = shim.fp
    p = f.modulus
    col = lambda a: a.reshape(f.n_limbs, -1)[:, :1]
    xi = int(mont.to_ints(f, col(j.x))[0])
    yi = int(mont.to_ints(f, col(j.y))[0])
    zi = int(mont.to_ints(f, col(j.z))[0])
    if zi == 0:
        return None
    return (xi * pow(zi, -2, p) % p, yi * pow(zi, -3, p) % p)


@pytest.mark.parametrize("scal_mode", ["uniform", "all_equal"])
def test_msm_fast_interpret_vs_host(cs, monkeypatch, scal_mode):
    """End-to-end msm_fast glue (payload sort + run-copy DMA + rounds kernel
    + reduction + overflow passes) in interpret mode on the toy curve vs the
    host reference MSM.  all_equal scalars force every point into ONE bucket
    per window — the pathological-skew fallback path."""
    monkeypatch.setattr(pm, "BL", 8)
    import jax.numpy as jnp

    from gnark_crypto_tpu.curves.point import Affine

    spec = cs.fp

    class Shim:
        fp = spec
        fr = spec  # digits just read limb rows; babybear as both works
        a = cs.a
        b = cs.b
        ref = cs.ref

    rng = np.random.default_rng(7)
    n = 64
    G = cs.ref._gen
    host_pts = [cs.ref.mul(int(k), G) for k in rng.integers(1, 50, n)]
    if scal_mode == "uniform":
        scal = [int(s) for s in rng.integers(0, spec.modulus, n)]
    else:
        scal = [12345678] * n
    xs = np.stack([np.asarray(spec.mont_limbs(p[0])) for p in host_pts], 1)
    ys = np.stack([np.asarray(spec.mont_limbs(p[1])) for p in host_pts], 1)
    pts = Affine(jnp.asarray(xs.astype(np.uint32)),
                 jnp.asarray(ys.astype(np.uint32)))
    sc = np.zeros((spec.n_limbs, n), np.uint32)
    for i, s in enumerate(scal):
        for j in range(spec.n_limbs):
            sc[j, i] = (s >> (16 * j)) & 0xFFFF
    out = pm.msm_fast(Shim, pts, jnp.asarray(sc), c=5, interpret=True)
    want = None
    for p, s in zip(host_pts, scal):
        want = cs.ref.add(want, cs.ref.mul(s, p))
    got = _jac_to_host(Shim, out)
    assert got == want
