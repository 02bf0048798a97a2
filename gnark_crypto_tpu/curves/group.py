"""Generic batched short-Weierstrass group over any flat field Ops.

The group-law formulas of curves/point.py (complete Jacobian add/double with
selects) parameterized over a towers/ext.py Ops object instead of fields.mont,
so the SAME code implements:

  G1           (coordinates in Fp      — PrimeOps)
  G2 bn/bls12  (coordinates in Fp2     — QuadOps, reference ecc/bn254/g2.go)
  G2 bls24     (coordinates in Fp4     — reference ecc/bls24-315/g2.go)
  G2 bw6       (coordinates in Fp      — reference ecc/bw6-761/g2.go)

Points are structure-of-arrays NamedTuples of (L, *batch) uint32 arrays, so
MSM scatter/gather and serialization treat every group uniformly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import LIMB_BITS, FieldSpec
from ..towers import ext as _ext
from ..towers.host import HostCurve


class AffineF(NamedTuple):
    x: jax.Array
    y: jax.Array


class JacF(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


@dataclasses.dataclass(frozen=True)
class Group:
    """Static context for one Weierstrass group: field ops + coefficients.

    a/b/generator are HOST field elements (ints for Fp, nested tuples for
    extensions).  `fr` is the scalar field (order-r subgroup)."""

    name: str
    ops: object            # PrimeOps | ExtOps (hashable)
    fr: FieldSpec
    a: object
    b: object
    gx: object
    gy: object
    cofactor: int = 1

    def __post_init__(self):
        h = self.host_curve
        G = (self._h(self.gx), self._h(self.gy))
        assert h.is_on_curve(G), f"{self.name}: generator not on curve"
        assert h.mul(self.fr.modulus, G) is None, (
            f"{self.name}: generator order != r"
        )

    def _h(self, v):
        return self.ops.host.embed(v) if isinstance(v, int) else v

    @functools.cached_property
    def host_curve(self) -> HostCurve:
        h = self.ops.host
        return HostCurve(h, self._h(self.b), self._h(self.a))

    @property
    def a_is_zero(self) -> bool:
        return self.ops.host.is_zero(self._h(self.a))

    @property
    def L(self) -> int:
        return self.ops.L

    def generator(self, batch=()) -> AffineF:
        return AffineF(
            self.ops.const(self._h(self.gx), batch),
            self.ops.const(self._h(self.gy), batch),
        )


# ---------------------------------------------------------------------------
# construction / conversion
# ---------------------------------------------------------------------------


def affine_from_host(g: Group, pts) -> AffineF:
    """pts: list of host (x, y) tuples or None for infinity."""
    h = g.ops.host
    xs = [h.zero() if P is None else g._h(P[0]) for P in pts]
    ys = [h.zero() if P is None else g._h(P[1]) for P in pts]
    return AffineF(g.ops.from_ints(xs), g.ops.from_ints(ys))


def affine_to_host(g: Group, a: AffineF):
    h = g.ops.host
    xs = g.ops.to_ints(a.x)
    ys = g.ops.to_ints(a.y)
    out = np.empty(xs.shape, dtype=object)
    it = np.nditer(xs, flags=["multi_index", "refs_ok"])
    for _ in it:
        i = it.multi_index
        if h.is_zero(xs[i]) and h.is_zero(ys[i]):
            out[i] = None
        else:
            out[i] = (xs[i], ys[i])
    return out


def affine_is_inf(g: Group, a: AffineF) -> jax.Array:
    return jnp.logical_and(g.ops.is_zero(a.x), g.ops.is_zero(a.y))


def jac_is_inf(g: Group, p: JacF) -> jax.Array:
    return g.ops.is_zero(p.z)


def jac_from_affine(g: Group, a: AffineF) -> JacF:
    F = g.ops
    inf = affine_is_inf(g, a)
    batch = a.x.shape[1:]
    return JacF(a.x, a.y, F.select(inf, F.zeros(batch), F.one(batch)))


def jac_to_affine(g: Group, p: JacF) -> AffineF:
    """Batch conversion, one shared inversion chain (g1.go:989 analogue)."""
    F = g.ops
    batch = p.z.shape[1:]
    if len(batch) == 0:
        zflat = p.z.reshape(F.L, 1)
        zinv = _ext.batch_inverse(F, zflat, axis=1).reshape(F.L)
    else:
        zflat = p.z.reshape(F.L, -1)
        zinv = _ext.batch_inverse(F, zflat, axis=1).reshape(p.z.shape)
    zinv2 = F.square(zinv)
    zinv3 = F.mul(zinv2, zinv)
    x = F.mul(p.x, zinv2)
    y = F.mul(p.y, zinv3)
    inf = jac_is_inf(g, p)
    zero = F.zeros(batch)
    return AffineF(F.select(inf, zero, x), F.select(inf, zero, y))


def jac_inf(g: Group, batch_shape=()) -> JacF:
    F = g.ops
    return JacF(F.one(batch_shape), F.one(batch_shape), F.zeros(batch_shape))


def affine_neg(g: Group, a: AffineF) -> AffineF:
    return AffineF(a.x, g.ops.neg(a.y))


def jac_neg(g: Group, p: JacF) -> JacF:
    return JacF(p.x, g.ops.neg(p.y), p.z)


def affine_select(g: Group, mask, a: AffineF, b: AffineF) -> AffineF:
    F = g.ops
    return AffineF(F.select(mask, a.x, b.x), F.select(mask, a.y, b.y))


def jac_select(g: Group, mask, a: JacF, b: JacF) -> JacF:
    F = g.ops
    return JacF(
        F.select(mask, a.x, b.x),
        F.select(mask, a.y, b.y),
        F.select(mask, a.z, b.z),
    )


def is_on_curve_affine(g: Group, a: AffineF) -> jax.Array:
    F = g.ops
    y2 = F.square(a.y)
    x3 = F.mul(F.square(a.x), a.x)
    rhs = F.add(x3, F.const(g._h(g.b), a.x.shape[1:]))
    if not g.a_is_zero:
        rhs = F.add(rhs, F.mul(a.x, F.const(g._h(g.a), a.x.shape[1:])))
    return jnp.logical_or(F.eq(y2, rhs), affine_is_inf(g, a))


# ---------------------------------------------------------------------------
# group law (complete, branchless) — formulas as in curves/point.py
# ---------------------------------------------------------------------------


def jac_double(g: Group, p: JacF) -> JacF:
    F = g.ops
    A = F.square(p.x)
    B = F.square(p.y)
    C = F.square(B)
    t = F.square(F.add(p.x, B))
    D = F.double(F.sub(F.sub(t, A), C))
    E = F.add(F.double(A), A)
    if not g.a_is_zero:
        z2 = F.square(p.z)
        z4 = F.square(z2)
        E = F.add(E, F.mul(z4, F.const(g._h(g.a), p.x.shape[1:])))
    Fq = F.square(E)
    x3 = F.sub(Fq, F.double(D))
    y3 = F.sub(
        F.mul(E, F.sub(D, x3)),
        F.double(F.double(F.double(C))),
    )
    z3 = F.double(F.mul(p.y, p.z))
    return JacF(x3, y3, z3)


def jac_add(g: Group, p: JacF, q: JacF) -> JacF:
    F = g.ops
    z1z1 = F.square(p.z)
    z2z2 = F.square(q.z)
    u1 = F.mul(p.x, z2z2)
    u2 = F.mul(q.x, z1z1)
    s1 = F.mul(F.mul(p.y, q.z), z2z2)
    s2 = F.mul(F.mul(q.y, p.z), z1z1)
    h = F.sub(u2, u1)
    i = F.square(F.double(h))
    j = F.mul(h, i)
    r = F.double(F.sub(s2, s1))
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.square(r), j), F.double(v))
    y3 = F.sub(F.mul(r, F.sub(v, x3)), F.double(F.mul(s1, j)))
    zsum = F.square(F.add(p.z, q.z))
    z3 = F.mul(F.sub(F.sub(zsum, z1z1), z2z2), h)
    out = JacF(x3, y3, z3)

    p_inf = jac_is_inf(g, p)
    q_inf = jac_is_inf(g, q)
    hz = F.is_zero(h)
    rz = F.is_zero(r)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    dbl_case = jnp.logical_and(both, jnp.logical_and(hz, rz))
    inf_case = jnp.logical_and(both, jnp.logical_and(hz, jnp.logical_not(rz)))

    out = jac_select(g, dbl_case, jac_double(g, p), out)
    out = jac_select(g, inf_case, jac_inf(g, p.z.shape[1:]), out)
    out = jac_select(g, p_inf, q, out)
    out = jac_select(g, q_inf, p, out)
    return out


def jac_add_mixed(g: Group, p: JacF, q: AffineF) -> JacF:
    F = g.ops
    one = F.one(p.z.shape[1:])
    z1z1 = F.square(p.z)
    u2 = F.mul(q.x, z1z1)
    s2 = F.mul(F.mul(q.y, p.z), z1z1)
    h = F.sub(u2, p.x)
    i = F.square(F.double(h))
    j = F.mul(h, i)
    r = F.double(F.sub(s2, p.y))
    v = F.mul(p.x, i)
    x3 = F.sub(F.sub(F.square(r), j), F.double(v))
    y3 = F.sub(F.mul(r, F.sub(v, x3)), F.double(F.mul(p.y, j)))
    zsum = F.square(F.add(p.z, one))
    z3 = F.mul(F.sub(F.sub(zsum, z1z1), one), h)
    out = JacF(x3, y3, z3)

    p_inf = jac_is_inf(g, p)
    q_inf = affine_is_inf(g, q)
    hz = F.is_zero(h)
    rz = F.is_zero(r)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    dbl_case = jnp.logical_and(both, jnp.logical_and(hz, rz))
    inf_case = jnp.logical_and(both, jnp.logical_and(hz, jnp.logical_not(rz)))

    out = jac_select(g, dbl_case, jac_double(g, p), out)
    out = jac_select(g, inf_case, jac_inf(g, p.z.shape[1:]), out)
    out = jac_select(g, p_inf, jac_from_affine(g, q), out)
    out = jac_select(g, q_inf, p, out)
    return out


# ---------------------------------------------------------------------------
# scalar multiplication
# ---------------------------------------------------------------------------


def scalar_mul(g: Group, base: AffineF, scalars: jax.Array) -> JacF:
    """Batched double-and-add over plain fr limb arrays (n_limbs, *batch)."""
    fr = g.fr
    nbits = fr.n_limbs * LIMB_BITS
    limb_idx = np.array([(nbits - 1 - i) // LIMB_BITS for i in range(nbits)], np.int32)
    shift = np.array([(nbits - 1 - i) % LIMB_BITS for i in range(nbits)], np.int32)

    acc0 = jac_inf(g, base.x.shape[1:])

    def body(acc, x):
        li, sh = x
        acc = jac_double(g, acc)
        bit = (scalars[li] >> sh.astype(jnp.uint32)) & 1
        added = jac_add_mixed(g, acc, base)
        acc = jac_select(g, bit == 1, added, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(limb_idx), jnp.asarray(shift)))
    return acc


def subgroup_check(g: Group, a: AffineF) -> jax.Array:
    """[r]P == inf — the defining (slow, generic) subgroup membership test
    (IsInSubGroup, g2.go; the reference's endomorphism shortcuts are a later
    optimization)."""
    from ..fields.spec import int_to_limbs

    limbs = np.zeros((g.fr.n_limbs,) + a.x.shape[1:], dtype=np.uint32)

    rl = int_to_limbs(g.fr.modulus, g.fr.n_limbs)
    for i, v in enumerate(rl):
        limbs[i] = v
    acc = scalar_mul(g, a, jnp.asarray(limbs))
    return jnp.logical_or(jac_is_inf(g, acc), affine_is_inf(g, a))


@functools.cache
def g1_group(curve_name: str) -> Group:
    """G1 of a named curve as a generic Group (PrimeOps coordinates)."""
    from ..towers.ext import PrimeOps
    from . import spec as cspec

    cs = getattr(cspec, curve_name)()
    return Group(
        name=f"{curve_name}_g1",
        ops=PrimeOps(cs.fp),
        fr=cs.fr,
        a=cs.a,
        b=cs.b,
        gx=cs.gx,
        gy=cs.gy,
        cofactor=cs.cofactor,
    )
