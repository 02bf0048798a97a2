"""Fixed-base batched scalar multiplication (BatchScalarMultiplicationG1,
g1.go:1039 analogue): host-precomputed window table + device gather/add tree.

Used mainly for SRS generation (kzg.go:72 NewSRS computes [tau^i]G1)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.spec import LIMB_BITS
from .point import Affine, Jac, jac_add, jac_inf
from .spec import CurveSpec


def _window_table_host(cs: CurveSpec, base, c: int) -> tuple[np.ndarray, np.ndarray]:
    """T[w][d] = d * 2^(cw) * base as affine int coords (None -> (0,0));
    returns two (n_windows, 2^c, n_limbs) uint32 mont-limb arrays."""
    fr_bits = cs.fr.bits
    n_windows = -(-fr_bits // c)
    f = cs.fp
    xs = np.zeros((n_windows, 1 << c, f.n_limbs), np.uint32)
    ys = np.zeros_like(xs)
    P = base
    for w in range(n_windows):
        acc = None
        for d in range(1, 1 << c):
            acc = cs.ref.add(acc, P)
            if acc is not None:
                xs[w, d] = f.mont_limbs(acc[0])
                ys[w, d] = f.mont_limbs(acc[1])
        # advance P by 2^c doublings
        for _ in range(c):
            P = cs.ref.double(P)
    return xs, ys


def batch_scalar_mul_fixed_base(
    cs: CurveSpec, base, scalars: jax.Array, c: int = 8
) -> Jac:
    """[k_i] * base for a host-known affine base point and a device array of
    plain fr scalars (n_limbs, N).  Cost: n_windows gathers + tree of
    complete adds; table built host-side (small: n_windows * 2^c points)."""
    assert base is not None
    f = cs.fp
    fr = cs.fr
    fr_bits = fr.bits
    n_windows = -(-fr_bits // c)
    xs, ys = _window_table_host(cs, base, c)
    tx = jnp.asarray(np.moveaxis(xs, -1, 0))  # (n_limbs, n_windows, 2^c)
    ty = jnp.asarray(np.moveaxis(ys, -1, 0))

    n = scalars.shape[1]
    mask = jnp.uint32((1 << c) - 1)
    digs = []
    for w in range(n_windows):
        o = w * c
        i0, sh = o // LIMB_BITS, o % LIMB_BITS
        lo = scalars[i0]
        hi = (
            scalars[i0 + 1]
            if i0 + 1 < fr.n_limbs
            else jnp.zeros_like(lo)
        )
        digs.append(
            (((lo | (hi << LIMB_BITS)) >> jnp.uint32(sh)) & mask).astype(jnp.int32)
        )
    digits = jnp.stack(digs, axis=0)  # (n_windows, N)
    # accumulate windows under one scan (one compiled complete-add body)
    txw = jnp.moveaxis(tx, 1, 0)  # (n_windows, n_limbs, 2^c)
    tyw = jnp.moveaxis(ty, 1, 0)

    @jax.jit
    def run(txw, tyw, digits):
        def body(acc, xs):
            tx_w, ty_w, d = xs
            px = tx_w[:, d]  # (n_limbs, N)
            py = ty_w[:, d]
            inf = jnp.logical_and(mont.is_zero(f, px), mont.is_zero(f, py))
            z = mont.select(inf, mont.zeros(f, (n,)), mont.one(f, (n,)))
            return jac_add(cs, acc, Jac(px, py, z)), None

        acc0 = jac_inf(cs, (n,))
        acc, _ = jax.lax.scan(body, acc0, (txw, tyw, digits))
        return acc

    return run(txw, tyw, digits)
