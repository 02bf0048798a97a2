"""Dense multilinear polynomials on the boolean hypercube (SoA, batched).

Mirrors fr/polynomial/multilin.go: Fold, Evaluate, eq-table.  A multilinear
with v variables is a (n_limbs, 2^v) array of evaluations; index bit i (MSB
first) is variable i — Fold binds the FIRST variable, like the reference."""

from __future__ import annotations

import jax

from ..fields import mont
from ..fields.spec import FieldSpec


def fold(spec: FieldSpec, m: jax.Array, r) -> jax.Array:
    """Bind the first variable to r: out = (1-r)*m[0::] + r*m[1::] on halves
    (multilin.go Fold)."""
    n = m.shape[1]
    half = n // 2
    f0 = m[:, :half]
    f1 = m[:, half:]
    if isinstance(r, int):
        r = mont.const(spec, r, (1,))
    diff = mont.sub(spec, f1, f0)
    return mont.add(spec, f0, mont.mul(spec, diff, r))


def evaluate(spec: FieldSpec, m: jax.Array, rs: list) -> jax.Array:
    """Full evaluation at a point (list of ints or (n_limbs,1) arrays)."""
    for r in rs:
        m = fold(spec, m, r)
    return m[:, 0]


def eq_table(spec: FieldSpec, rs: list[int]) -> jax.Array:
    """eq(r, x) for all x in {0,1}^v (the eq-table used by GKR):
    built by doubling, v vectorized muls.

    Variable order matches fold()/_mle_eval: rs[0] is the FIRST (most
    significant index bit) variable — each concat doubles the table with the
    new variable as the new MSB, so rs must be consumed in reverse."""
    import jax.numpy as jnp

    tab = mont.one(spec, (1,))
    for r in reversed(rs):
        rc = mont.const(spec, r, (1,))
        hi = mont.mul(spec, tab, rc)      # x_i = 1 branch
        lo = mont.sub(spec, tab, hi)      # x_i = 0: tab*(1-r)
        tab = jnp.concatenate([lo, hi], axis=1)
    return tab


def hypercube_sum(spec: FieldSpec, m: jax.Array) -> jax.Array:
    return mont.sum_axis(spec, m, axis=1)
