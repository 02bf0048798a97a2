"""Fused Pallas TPU kernels for complete Jacobian point add / double.

The round-2 hot path issued ~16 separate Montgomery muls per point add, each
its own Pallas launch with HBM round-trips between every field op.  These
kernels fuse the WHOLE group-law formula (the same complete add-2007-bl /
dbl-2009-l + case selects as curves/point.py) into one VMEM-resident kernel
using the fields/kernel_lang.py lazy-reduction field ops:

- storage stays 16-bit limbs in uint32 (fields/spec.py); the kernel converts
  to the per-field kernel radix (r=13, n=20 for bn254/bls12 Fp) on load and
  canonicalizes on store;
- interior values live in the "< 2q, normalized limbs" domain — no
  conditional subtract per mul, no lo/hi splitting (kernel_lang docstring);
- ~26 field muls + all adds/subs/selects of a complete add never touch HBM.

This is the role the generated assembly plays in the reference
(field/asm/element_4w_amd64.s REDUCE macro :16-29; SURVEY.md §2.1 asm
generator), realized as Pallas kernels per SURVEY.md §2's mandate.

Dispatch happens in curves/point.py: on TPU with a large enough batch,
jac_add/jac_double route here; the XLA-scan path remains the CPU/test
("purego"-analogue) fallback.  interpret=True runs the same kernel on CPU
for parity tests (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.kernel_lang import KF, kspec
from .spec import CurveSpec

DEFAULT_BLOCK = 512


def _load(kf: KF, ref, n16: int):
    return kf.load16([ref[i, :] for i in range(n16)])


def _store(kf: KF, ref, val, n16: int):
    rows = kf.store16(val, n16)
    for i in range(n16):
        ref[i, :] = rows[i]


def _k_double(kf: KF, a_mont: int | None, X, Y, Z):
    """dbl-2009-l (a=0) / dbl-2007-bl; infinity-safe (Z3 = 2YZ = 0)."""
    A = kf.sqr(X)
    B = kf.sqr(Y)
    C = kf.sqr(B)
    t = kf.sqr(kf.add(X, B))
    D = kf.double(kf.sub(kf.sub(t, A), C))
    E = kf.add(kf.double(A), A)
    if a_mont is not None:
        z2 = kf.sqr(Z)
        z4 = kf.sqr(z2)
        E = kf.add(E, kf.mul(z4, kf.const_mont(a_mont, X)))
    F = kf.sqr(E)
    x3 = kf.sub(F, kf.double(D))
    y3 = kf.sub(
        kf.mul(E, kf.sub(D, x3)),
        kf.double(kf.double(kf.double(C))),
    )
    z3 = kf.double(kf.mul(Y, Z))
    return x3, y3, z3


def _jac_double_kernel(spec, a_mont, x_ref, y_ref, z_ref, ox, oy, oz):
    kf = KF(kspec(spec))
    n16 = spec.n_limbs
    X = _load(kf, x_ref, n16)
    Y = _load(kf, y_ref, n16)
    Z = _load(kf, z_ref, n16)
    x3, y3, z3 = _k_double(kf, a_mont, X, Y, Z)
    _store(kf, ox, x3, n16)
    _store(kf, oy, y3, n16)
    _store(kf, oz, z3, n16)


def _jac_add_kernel(spec, a_mont, px, py, pz, qx, qy, qz, ox, oy, oz):
    """Complete Jacobian add (add-2007-bl + case selects), fused."""
    kf = KF(kspec(spec))
    n16 = spec.n_limbs
    X1 = _load(kf, px, n16)
    Y1 = _load(kf, py, n16)
    Z1 = _load(kf, pz, n16)
    X2 = _load(kf, qx, n16)
    Y2 = _load(kf, qy, n16)
    Z2 = _load(kf, qz, n16)

    z1z1 = kf.sqr(Z1)
    z2z2 = kf.sqr(Z2)
    u1 = kf.mul(X1, z2z2)
    u2 = kf.mul(X2, z1z1)
    s1 = kf.mul(kf.mul(Y1, Z2), z2z2)
    s2 = kf.mul(kf.mul(Y2, Z1), z1z1)
    h = kf.sub(u2, u1)
    i = kf.sqr(kf.double(h))
    j = kf.mul(h, i)
    r = kf.double(kf.sub(s2, s1))
    v = kf.mul(u1, i)
    x3 = kf.sub(kf.sub(kf.sqr(r), j), kf.double(v))
    y3 = kf.sub(kf.mul(r, kf.sub(v, x3)), kf.double(kf.mul(s1, j)))
    zs = kf.sqr(kf.add(Z1, Z2))
    z3 = kf.mul(kf.sub(kf.sub(zs, z1z1), z2z2), h)

    p_inf = kf.is_zero(Z1)
    q_inf = kf.is_zero(Z2)
    hz = kf.is_zero(h)
    rz = kf.is_zero(r)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    dbl_case = jnp.logical_and(both, jnp.logical_and(hz, rz))
    inf_case = jnp.logical_and(both, jnp.logical_and(hz, jnp.logical_not(rz)))

    dx, dy, dz = _k_double(kf, a_mont, X1, Y1, Z1)
    one = kf.one_mont(X1)
    zero = kf.zero(X1)

    out = []
    for w3, dw, infw, pw, qw in (
        (x3, dx, one, X1, X2),
        (y3, dy, one, Y1, Y2),
        (z3, dz, zero, Z1, Z2),
    ):
        w = kf.select(dbl_case, dw, w3)
        w = kf.select(inf_case, infw, w)
        w = kf.select(p_inf, qw, w)
        w = kf.select(q_inf, pw, w)
        out.append(w)

    _store(kf, ox, out[0], n16)
    _store(kf, oy, out[1], n16)
    _store(kf, oz, out[2], n16)


def _grid_call(kernel, spec, arrays, n_out: int, block: int, interpret: bool):
    """Common pallas_call wrapper: (n16, N) operands, grid over N blocks."""
    n16, N = arrays[0].shape
    Np = -(-N // block) * block
    if Np != N:
        arrays = [jnp.pad(a, ((0, 0), (0, Np - N))) for a in arrays]
    spec_b = pl.BlockSpec((n16, block), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n16, Np), jnp.uint32)] * n_out,
        grid=(Np // block,),
        in_specs=[spec_b] * len(arrays),
        out_specs=[spec_b] * n_out,
        interpret=interpret,
    )(*arrays)
    if Np != N:
        out = [o[:, :N] for o in out]
    return out


def _a_mont(cs: CurveSpec) -> int | None:
    """Plain curve `a`; the kernel embeds it via const_mont (kernel form)."""
    if cs.a == 0:
        return None
    return cs.a % cs.fp.modulus


@functools.partial(jax.jit, static_argnums=(0, 7, 8))
def jac_add(cs: CurveSpec, px, py, pz, qx, qy, qz,
            block: int = DEFAULT_BLOCK, interpret: bool = False):
    """Fused complete Jacobian add over 2-D (n_limbs, N) coordinate arrays."""
    kernel = functools.partial(_jac_add_kernel, cs.fp, _a_mont(cs))
    return _grid_call(kernel, cs.fp, [px, py, pz, qx, qy, qz], 3,
                      block, interpret)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def jac_double(cs: CurveSpec, x, y, z,
               block: int = DEFAULT_BLOCK, interpret: bool = False):
    """Fused Jacobian doubling over 2-D (n_limbs, N) coordinate arrays."""
    kernel = functools.partial(_jac_double_kernel, cs.fp, _a_mont(cs))
    return _grid_call(kernel, cs.fp, [x, y, z], 3, block, interpret)
