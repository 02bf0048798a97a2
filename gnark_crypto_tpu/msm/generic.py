"""Pippenger MSM generic over any curves/group.py Group (G1 or G2).

Same TPU-first schedule as msm/msm.py (signed digits, argsort + segmented-scan
bucket accumulation — exact for any distribution, no capacity — blocked
running-sum window reduce, Horner window fold; see that module's docstring and
ecc/bn254/multiexp.go); the field is abstracted behind the flat Ops protocol
so G2 MSM over Fp2/Fp4 coordinates (reference: ecc/bn254/g2.go MultiExp,
ecc/bls24-315/multiexp.go) is the same code as G1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves.group import (
    AffineF,
    Group,
    JacF,
    jac_add,
    jac_double,
    jac_inf,
    jac_select,
)
from .msm import DEFAULT_CHUNK, _msm_core, _PointOps, _pad_pow2, default_window


def _ops_for_group(g: Group) -> _PointOps:
    F = g.ops
    return _PointOps(
        L=F.L,
        jac=JacF,
        add=lambda p, q: jac_add(g, p, q),
        double=lambda p: jac_double(g, p),
        inf=lambda batch: jac_inf(g, batch),
        select=lambda m, a, b: jac_select(g, m, a, b),
        fneg=F.neg,
        fselect=F.select,
        fone=F.one,
        fzeros=F.zeros,
    )


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_jit(g: Group, points: AffineF, scalars: jax.Array, c: int,
            chunk: int = DEFAULT_CHUNK) -> JacF:
    return _msm_core(_ops_for_group(g), g.fr.bits, points, scalars, c, chunk)


def msm(g: Group, points: AffineF, scalars: jax.Array,
        c: int | None = None, chunk: int = DEFAULT_CHUNK) -> JacF:
    """MultiExp over any Group; exact for any input (segmented-scan buckets)."""
    n = points.x.shape[1]
    if c is None:
        c = default_window(n, g.fr.bits)
    points, scalars, _ = _pad_pow2(points, scalars)
    return msm_jit(g, AffineF(*points), scalars, c, chunk)
