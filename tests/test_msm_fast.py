"""Rounds-based MSM (msm/pallas_msm.py) vs host oracles.

The rounds kernel is the TPU analogue of the reference's conflict-free bucket
batch (multiexp_affine.go:18): these tests drive it in interpret mode (the
purego analogue) over hand-built windows covering every group-law edge the
kernel must select between: empty buckets, masked lanes, duplicate points
(doubling), and P + (-P) cancellation."""

import dataclasses

import numpy as np
import pytest

import gnark_crypto_tpu.msm.pallas_msm as pm
from gnark_crypto_tpu.curves import bn254
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


def _dense_from_buckets(cs, buckets_pts, nb, P):
    """buckets_pts: list (len <= nb) of lists of host (point, code) entries
    where code 1 = add P, 2 = add -P (kernel negates y)."""
    f = cs.fp
    dxy = np.zeros((P, 2 * f.n_limbs, nb), dtype=np.uint32)
    code = np.zeros((P, 1, nb), dtype=np.uint32)
    for b, pts in enumerate(buckets_pts):
        for r, (pt, cd) in enumerate(pts):
            x, y = pt
            dxy[r, : f.n_limbs, b] = f.mont_limbs(x)
            dxy[r, f.n_limbs :, b] = f.mont_limbs(y)
            code[r, 0, b] = cd
    return dxy, code


def _xyzz_to_host(cs, X, Y, ZZ, ZZZ, col):
    f = cs.fp
    p = f.modulus
    xi = int(mont.to_ints(f, X[:, col : col + 1])[0])
    yi = int(mont.to_ints(f, Y[:, col : col + 1])[0])
    zzi = int(mont.to_ints(f, ZZ[:, col : col + 1])[0])
    zzzi = int(mont.to_ints(f, ZZZ[:, col : col + 1])[0])
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
    dxy, code = _dense_from_buckets(cs, buckets, nb, P)
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a, v: pm._run_rounds(cs.fp, 0, P, nb, True, a, v))
    X, Y, ZZ, ZZZ = f(jnp.asarray(dxy), jnp.asarray(code))
    for b, bucket in enumerate(buckets):
        want = None
        for q, cd in bucket:
            want = ref.add(want, q if cd == 1 else ref.neg(q))
        got = _xyzz_to_host(cs, X, Y, ZZ, ZZZ, b)
        assert got == want, f"bucket {b}: {got} != {want}"
