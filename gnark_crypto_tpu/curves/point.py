"""Batched short-Weierstrass point arithmetic, structure-of-arrays.

TPU-native counterpart of the reference's G1 types (ecc/bn254/g1.go:36-989:
G1Affine / G1Jac).  Every op is *complete* (branchless: doubling, infinity and
inverse cases resolved with selects) because data-dependent branching is not an
option in a SIMD regime — this replaces the reference's if/else point code.

Conventions match the reference:
- affine infinity is (0, 0)            (g1.go unmarshal convention)
- Jacobian infinity is Z == 0
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from .spec import CurveSpec


class Affine(NamedTuple):
    x: jax.Array
    y: jax.Array


class Jac(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


# ---------------------------------------------------------------------------
# construction / conversion
# ---------------------------------------------------------------------------


def affine_from_ints(cs: CurveSpec, pts) -> Affine:
    """pts: list of (x, y) int tuples or None for infinity."""
    xs = [0 if P is None else P[0] for P in pts]
    ys = [0 if P is None else P[1] for P in pts]
    f = cs.fp
    return Affine(mont.from_ints(f, xs), mont.from_ints(f, ys))


def affine_to_ints(cs: CurveSpec, a: Affine):
    f = cs.fp
    xs = mont.to_ints(f, a.x)
    ys = mont.to_ints(f, a.y)
    out = np.empty(xs.shape, dtype=object)
    it = np.nditer(xs, flags=["multi_index", "refs_ok"])
    for _ in it:
        i = it.multi_index
        out[i] = None if (xs[i] == 0 and ys[i] == 0) else (int(xs[i]), int(ys[i]))
    return out


def affine_is_inf(cs: CurveSpec, a: Affine) -> jax.Array:
    f = cs.fp
    return jnp.logical_and(mont.is_zero(f, a.x), mont.is_zero(f, a.y))


def jac_is_inf(cs: CurveSpec, p: Jac) -> jax.Array:
    return mont.is_zero(cs.fp, p.z)


def jac_from_affine(cs: CurveSpec, a: Affine) -> Jac:
    f = cs.fp
    inf = affine_is_inf(cs, a)
    batch = a.x.shape[1:]
    z = mont.select(inf, mont.zeros(f, batch), mont.one(f, batch))
    return Jac(a.x, a.y, z)


def jac_to_affine(cs: CurveSpec, p: Jac) -> Affine:
    """Batch conversion with one shared inversion chain
    (BatchJacobianToAffineG1, g1.go:989)."""
    f = cs.fp
    batch = p.z.shape[1:]
    if len(batch) == 0:
        zflat = p.z.reshape(f.n_limbs, 1)
        zinv = mont.batch_inverse(f, zflat, axis=1).reshape(f.n_limbs)
    else:
        zflat = p.z.reshape(f.n_limbs, -1)
        zinv = mont.batch_inverse(f, zflat, axis=1).reshape(p.z.shape)
    zinv2 = mont.square(f, zinv)
    zinv3 = mont.mul(f, zinv2, zinv)
    x = mont.mul(f, p.x, zinv2)
    y = mont.mul(f, p.y, zinv3)
    inf = jac_is_inf(cs, p)
    zero = mont.zeros(f, batch)
    return Affine(mont.select(inf, zero, x), mont.select(inf, zero, y))


def jac_inf(cs: CurveSpec, batch_shape=()) -> Jac:
    f = cs.fp
    z = mont.zeros(f, batch_shape)
    return Jac(mont.one(f, batch_shape), mont.one(f, batch_shape), z)


def generator(cs: CurveSpec, batch_shape=()) -> Affine:
    f = cs.fp
    return Affine(
        mont.const(f, cs.gx, batch_shape), mont.const(f, cs.gy, batch_shape)
    )


def affine_neg(cs: CurveSpec, a: Affine) -> Affine:
    return Affine(a.x, mont.neg(cs.fp, a.y))


def jac_neg(cs: CurveSpec, p: Jac) -> Jac:
    return Jac(p.x, mont.neg(cs.fp, p.y), p.z)


def affine_select(mask, a: Affine, b: Affine) -> Affine:
    return Affine(mont.select(mask, a.x, b.x), mont.select(mask, a.y, b.y))


def jac_select(mask, a: Jac, b: Jac) -> Jac:
    return Jac(
        mont.select(mask, a.x, b.x),
        mont.select(mask, a.y, b.y),
        mont.select(mask, a.z, b.z),
    )


def is_on_curve_affine(cs: CurveSpec, a: Affine) -> jax.Array:
    """y^2 == x^3 + a*x + b, with infinity counted on-curve (g1.go IsOnCurve)."""
    f = cs.fp
    y2 = mont.square(f, a.y)
    x3 = mont.mul(f, mont.square(f, a.x), a.x)
    rhs = mont.add(f, x3, mont.const(f, cs.b, a.x.shape[1:]))
    if cs.a != 0:
        rhs = mont.add(f, rhs, mont.mul_const(f, a.x, cs.a))
    return jnp.logical_or(mont.eq(f, y2, rhs), affine_is_inf(cs, a))


# ---------------------------------------------------------------------------
# group law (complete, branchless)
# ---------------------------------------------------------------------------

# Fused-kernel dispatch: on TPU, batches run the whole group-law formula in
# ONE VMEM-resident Pallas kernel (curves/pallas_point.py) instead of ~16
# separate Montgomery-mul launches with HBM round-trips between them.  The
# composed-op path below stays as the CPU/test ("purego"-analogue) fallback.
# Threshold 1: even batch-1 adds (Horner window folds, bucket-reduce scan
# steps) are faster as one padded kernel launch than as ~50 XLA ops with
# lax.scan limb carries.
_FUSED_MIN_N = 1


def _fused_batch(*arrays):
    """Common broadcast batch if fused dispatch applies, else None."""
    import os

    if os.environ.get("GNARK_TPU_NO_FUSED"):
        return None
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    batch = jnp.broadcast_shapes(*(a.shape[1:] for a in arrays))
    n = 1
    for d in batch:
        n *= d
    return batch if n >= _FUSED_MIN_N else None


def _flat(a: jax.Array, batch) -> jax.Array:
    return jnp.broadcast_to(a, (a.shape[0],) + batch).reshape(a.shape[0], -1)


def jac_double(cs: CurveSpec, p: Jac) -> Jac:
    """dbl-2009-l (a=0) / dbl-2007-bl (general a); infinity-safe (Z3=2YZ=0)."""
    f = cs.fp
    batch = _fused_batch(p.x, p.y, p.z)
    if batch is not None:
        from . import pallas_point

        out = pallas_point.jac_double(
            cs, _flat(p.x, batch), _flat(p.y, batch), _flat(p.z, batch)
        )
        return Jac(*(o.reshape((f.n_limbs,) + batch) for o in out))
    A = mont.square(f, p.x)
    B = mont.square(f, p.y)
    C = mont.square(f, B)
    t = mont.square(f, mont.add(f, p.x, B))
    D = mont.double(f, mont.sub(f, mont.sub(f, t, A), C))
    E = mont.add(f, mont.double(f, A), A)  # 3A
    if cs.a != 0:
        z2 = mont.square(f, p.z)
        z4 = mont.square(f, z2)
        E = mont.add(f, E, mont.mul_const(f, z4, cs.a))
    F = mont.square(f, E)
    x3 = mont.sub(f, F, mont.double(f, D))
    y3 = mont.sub(
        f,
        mont.mul(f, E, mont.sub(f, D, x3)),
        mont.double(f, mont.double(f, mont.double(f, C))),
    )
    z3 = mont.double(f, mont.mul(f, p.y, p.z))
    return Jac(x3, y3, z3)


def jac_add(cs: CurveSpec, p: Jac, q: Jac) -> Jac:
    """Complete Jacobian add (add-2007-bl + case selects).

    Covers P==Q (double), P==-Q (infinity), P or Q at infinity — the branchy
    cases of the reference's AddAssign (g1.go:243) become selects.
    """
    f = cs.fp
    batch = _fused_batch(p.x, p.y, p.z, q.x, q.y, q.z)
    if batch is not None:
        from . import pallas_point

        out = pallas_point.jac_add(
            cs,
            _flat(p.x, batch), _flat(p.y, batch), _flat(p.z, batch),
            _flat(q.x, batch), _flat(q.y, batch), _flat(q.z, batch),
        )
        return Jac(*(o.reshape((f.n_limbs,) + batch) for o in out))
    z1z1 = mont.square(f, p.z)
    z2z2 = mont.square(f, q.z)
    u1 = mont.mul(f, p.x, z2z2)
    u2 = mont.mul(f, q.x, z1z1)
    s1 = mont.mul(f, mont.mul(f, p.y, q.z), z2z2)
    s2 = mont.mul(f, mont.mul(f, q.y, p.z), z1z1)
    h = mont.sub(f, u2, u1)
    i = mont.square(f, mont.double(f, h))
    j = mont.mul(f, h, i)
    r = mont.double(f, mont.sub(f, s2, s1))
    v = mont.mul(f, u1, i)
    x3 = mont.sub(f, mont.sub(f, mont.square(f, r), j), mont.double(f, v))
    y3 = mont.sub(
        f,
        mont.mul(f, r, mont.sub(f, v, x3)),
        mont.double(f, mont.mul(f, s1, j)),
    )
    zsum = mont.square(f, mont.add(f, p.z, q.z))
    z3 = mont.mul(f, mont.sub(f, mont.sub(f, zsum, z1z1), z2z2), h)
    out = Jac(x3, y3, z3)

    p_inf = jac_is_inf(cs, p)
    q_inf = jac_is_inf(cs, q)
    hz = mont.is_zero(f, h)
    rz = mont.is_zero(f, r)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    dbl_case = jnp.logical_and(both, jnp.logical_and(hz, rz))
    inf_case = jnp.logical_and(both, jnp.logical_and(hz, jnp.logical_not(rz)))

    out = jac_select(dbl_case, jac_double(cs, p), out)
    out = jac_select(inf_case, jac_inf(cs, p.z.shape[1:]), out)
    out = jac_select(p_inf, q, out)
    out = jac_select(q_inf, p, out)
    return out


def jac_add_mixed(cs: CurveSpec, p: Jac, q: Affine) -> Jac:
    """Complete mixed add (madd-2007-bl + case selects), Z2 = 1.

    Analogue of g1JacExtended addMixed (g1.go:736) in completeness, on the
    Jacobian representation."""
    f = cs.fp
    z1z1 = mont.square(f, p.z)
    u2 = mont.mul(f, q.x, z1z1)
    s2 = mont.mul(f, mont.mul(f, q.y, p.z), z1z1)
    h = mont.sub(f, u2, p.x)
    i = mont.square(f, mont.double(f, h))
    j = mont.mul(f, h, i)
    r = mont.double(f, mont.sub(f, s2, p.y))
    v = mont.mul(f, p.x, i)
    x3 = mont.sub(f, mont.sub(f, mont.square(f, r), j), mont.double(f, v))
    y3 = mont.sub(
        f,
        mont.mul(f, r, mont.sub(f, v, x3)),
        mont.double(f, mont.mul(f, p.y, j)),
    )
    zsum = mont.square(f, mont.add(f, p.z, mont.one(f, p.z.shape[1:])))
    z3 = mont.mul(f, mont.sub(f, mont.sub(f, zsum, z1z1), mont.one(f, p.z.shape[1:])), h)
    out = Jac(x3, y3, z3)

    p_inf = jac_is_inf(cs, p)
    q_inf = affine_is_inf(cs, q)
    hz = mont.is_zero(f, h)
    rz = mont.is_zero(f, r)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    dbl_case = jnp.logical_and(both, jnp.logical_and(hz, rz))
    inf_case = jnp.logical_and(both, jnp.logical_and(hz, jnp.logical_not(rz)))

    out = jac_select(dbl_case, jac_double(cs, p), out)
    out = jac_select(inf_case, jac_inf(cs, p.z.shape[1:]), out)
    out = jac_select(p_inf, jac_from_affine(cs, q), out)
    out = jac_select(q_inf, p, out)
    return out


# ---------------------------------------------------------------------------
# scalar multiplication
# ---------------------------------------------------------------------------


def scalar_mul(cs: CurveSpec, base: Affine, scalars: jax.Array) -> Jac:
    """Batched double-and-add: scalars are fr limb arrays (n_limbs, *batch),
    NOT in Montgomery form (plain residues).  MSB-first over fr.bits bits.

    Counterpart of mulWindowed/mulGLV (g1.go:486/:529); windowing/GLV come in
    the MSM path — this is the simple reference kernel.
    """
    from ..fields.spec import LIMB_BITS

    fr = cs.fr
    nbits = fr.n_limbs * LIMB_BITS
    limb_idx = np.array([(nbits - 1 - i) // LIMB_BITS for i in range(nbits)], np.int32)
    shift = np.array([(nbits - 1 - i) % LIMB_BITS for i in range(nbits)], np.int32)

    acc0 = jac_inf(cs, base.x.shape[1:])

    def body(acc, x):
        li, sh = x
        acc = jac_double(cs, acc)
        bit = (scalars[li] >> sh.astype(jnp.uint32)) & 1
        added = jac_add_mixed(cs, acc, base)
        acc = jac_select(bit == 1, added, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(limb_idx), jnp.asarray(shift)))
    return acc


def joint_scalar_mul(cs: CurveSpec, a1: Affine, a2: Affine,
                     s1: jax.Array, s2: jax.Array,
                     nbits: int | None = None) -> Jac:
    """[s1]a1 + [s2]a2 via Strauss-Shamir: one shared doubling chain, both
    points (and their sum) conditionally added per bit
    (JointScalarMultiplication, g1.go:602).  Scalars are plain limb arrays
    of at least ceil(nbits/16) limbs (default: full fr width).  ~25% fewer
    ops than two independent ladders; GLV callers pass half-width nbits."""
    from ..fields.spec import LIMB_BITS

    fr = cs.fr
    if nbits is None:
        nbits = fr.n_limbs * LIMB_BITS
    assert s1.shape[0] * LIMB_BITS >= nbits and s2.shape[0] * LIMB_BITS >= nbits
    limb_idx = np.array([(nbits - 1 - i) // LIMB_BITS for i in range(nbits)], np.int32)
    shift = np.array([(nbits - 1 - i) % LIMB_BITS for i in range(nbits)], np.int32)

    sum12 = jac_to_affine(cs, jac_add(cs, jac_from_affine(cs, a1),
                                      jac_from_affine(cs, a2)))
    sum_inf = affine_is_inf(cs, sum12)
    acc0 = jac_inf(cs, a1.x.shape[1:])

    def body(acc, x):
        li, sh = x
        acc = jac_double(cs, acc)
        b1 = ((s1[li] >> sh.astype(jnp.uint32)) & 1) == 1
        b2 = ((s2[li] >> sh.astype(jnp.uint32)) & 1) == 1
        both = jnp.logical_and(b1, b2)
        # both set: add (a1+a2); one set: add that point; the a1+a2==inf
        # corner (a2 = -a1) falls back to adding a1 then a2
        add1 = jac_add_mixed(cs, acc, a1)
        add2 = jac_add_mixed(cs, acc, a2)
        add12 = jac_add_mixed(cs, acc, sum12)
        add12 = jac_select(sum_inf, jac_add_mixed(cs, add1, a2), add12)
        out = jac_select(both, add12, jac_select(b1, add1, jac_select(b2, add2, acc)))
        return out, None

    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(limb_idx), jnp.asarray(shift)))
    return acc


def scalars_from_ints(cs: CurveSpec, values) -> jax.Array:
    """Plain (non-Montgomery) fr limb arrays for scalar multiplication."""
    return mont.from_ints(cs.fr, values, mont=False)
