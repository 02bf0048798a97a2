"""StarkNet Pedersen hash over the stark curve — TPU-batched.

Reference: ecc/stark-curve/pedersen-hash/pedersen_hash.go:11-112.  The
reference walks nibble-indexed precomputed tables point-by-point; here the
same map

    H(a, b) = x( shift + a_lo*P0 + a_hi*P1 + b_lo*P2 + b_hi*P3 )

(a_lo = low 248 bits, a_hi = top nibbles — the aBytes[1:]/aBytes[:1] split of
the reference) is evaluated as four batched fixed-base scalar multiplications
over the whole input vector at once (curves/fixed_base.py window tables), so
hashing N pairs costs 4 * n_windows complete adds on (N,)-wide lanes.

Constants are the StarkWare "fast_pedersen_hash" basis points (quoted in the
reference's init(); origin: starkware-libs/cairo-lang
src/starkware/crypto/signature/fast_pedersen_hash.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import stark_curve
from ..curves.fixed_base import batch_scalar_mul_fixed_base
from ..curves.point import Jac, jac_add, jac_to_affine
from ..fields import mont
from ..fields.spec import LIMB_BITS

SHIFT_POINT = (
    2089986280348253421170679821480865132823066470938446095505822317253594081284,
    1713931329540660377023406109199410414810705867260802078187082345529207694986,
)
P0 = (
    996781205833008774514500082376783249102396023663454813447423147977397232763,
    1668503676786377725805489344771023921079126552019160156920634619255970485781,
)
P1 = (
    2251563274489750535117886426533222435294046428347329203627021249169616184184,
    1798716007562728905295480679789526322175868328062420237419143593021674992973,
)
P2 = (
    2138414695194151160943305727036575959195309218611738193261179310511854807447,
    113410276730064486255102093846540133784865286929052426931474106396135072156,
)
P3 = (
    2379962749567351885752724891227938183011949129833673362440656643086021394946,
    776496453633298175483985398648758586525933812536653089401905292063708816422,
)

_LOW_BITS = 248  # aBytes[1:] of the 32-byte big-endian encoding


def _split_248(spec, a: jax.Array):
    """Split canonical fp limb arrays into (low 248 bits, high bits)."""
    cut = _LOW_BITS // LIMB_BITS               # limbs fully in the low part
    rem = _LOW_BITS % LIMB_BITS                # leftover bits in limb `cut`
    n = spec.n_limbs
    idx = jnp.arange(n)[(...,) + (None,) * (a.ndim - 1)]
    lo = jnp.where(idx < cut, a, 0)
    if rem:
        lo = lo.at[cut].set(a[cut] & jnp.uint32((1 << rem) - 1))
    # hi = a >> _LOW_BITS, limb-aligned shift
    hi = jnp.zeros_like(a)
    for i in range(cut, n):
        part = a[i] >> jnp.uint32(rem)
        if i + 1 < n and rem:
            part = part | ((a[i + 1] << jnp.uint32(LIMB_BITS - rem))
                           & jnp.uint32((1 << LIMB_BITS) - 1))
        hi = hi.at[i - cut].set(part)
    return lo, hi


def pedersen(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched Pedersen(a, b) -> fp x-coordinates.

    a, b: canonical (non-Montgomery) stark fp limb arrays (n_limbs, N).
    Returns canonical fp limb array (n_limbs, N) (pedersen_hash.go:77-112).
    """
    cs = stark_curve()
    f = cs.fp
    a_lo, a_hi = _split_248(f, a)
    b_lo, b_hi = _split_248(f, b)
    n = a.shape[1]
    acc = Jac(
        mont.const(f, SHIFT_POINT[0], (n,)),
        mont.const(f, SHIFT_POINT[1], (n,)),
        mont.one(f, (n,)),
    )
    for base, k in ((P0, a_lo), (P1, a_hi), (P2, b_lo), (P3, b_hi)):
        acc = jac_add(cs, acc, batch_scalar_mul_fixed_base(cs, base, k))
    aff = jac_to_affine(cs, acc)
    return mont.from_mont(f, aff.x)


def pedersen_ints(pairs) -> np.ndarray:
    """Host convenience: [(a, b), ...] ints -> np array of hash ints."""
    cs = stark_curve()
    f = cs.fp
    a = mont.from_ints(f, [p[0] for p in pairs], mont=False)
    b = mont.from_ints(f, [p[1] for p in pairs], mont=False)
    return mont.to_ints(f, pedersen(a, b), mont=False)


def pedersen_array(elems: list[int]) -> int:
    """PedersenArray (pedersen_hash.go:65-72): fold then append length."""
    d = 0
    for e in elems:
        d = int(pedersen_ints([(d, e)])[0])
    return int(pedersen_ints([(d, len(elems))])[0])


@functools.cache
def _host_oracle():
    """Host big-int Pedersen for cross-checks."""
    cs = stark_curve()

    def h(a: int, b: int) -> int:
        acc = SHIFT_POINT
        for base, k in (
            (P0, a % (1 << _LOW_BITS)),
            (P1, a >> _LOW_BITS),
            (P2, b % (1 << _LOW_BITS)),
            (P3, b >> _LOW_BITS),
        ):
            acc = cs.ref.add(acc, cs.ref.mul(k, base))
        return acc[0]

    return h
