"""Simplified SWU hash-to-curve map with isogeny (RFC 9380 §6.6.2/§6.6.3).

The reference uses SSWU for G1 of bls12-381/377, bls24-315/317, bw6-761/633
(ecc/<curve>/hash_to_g1.go MapToCurve1; suite constants in
internal/generator/config/<curve>.go).  Batched JAX formulation of the RFC's
straight-line map; suite constants live in sswu_data.py and are verified at
import (the isogenous curve E' must map onto E).

Cofactor clearing matches the reference exactly (required for vector parity):
- BLS12/BLS24 G1: [1 - x]P (ecc/bls12-381/g1.go:620 ClearCofactor, eprint
  2019/403 §5 — res = [|x|]q ± q depending on seed sign, i.e. (1-x)·q).
- BW6-761 G1: (103x³-83x²-40x+136)·P + φ((7x²+89x+130)·P)
  (ecc/bw6-761/g1.go:624, eprint 2020/351).
- BW6-633 G1: per ecc/bw6-633/g1.go ClearCofactor.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..fields import mont
from ..fields.reference import PF
from .point import Affine, Jac, jac_add, jac_double, jac_from_affine, jac_inf, jac_neg, jac_select
from .spec import CurveSpec
from .sswu_data import SUITES


@functools.cache
def suite_g1(curve_name: str):
    """Verified SSWU suite constants for a curve's G1 (prime-field)."""
    s = SUITES[f"{curve_name}_g1"]
    A, B, Z = s["A"][0], s["B"][0], s["Z"][0]
    iso = {
        k: [c[0] for c in v] for k, v in s["isogeny"].items()
    }  # prime field: one coordinate each

    # import-time verification: push a few points of E' through the isogeny
    # and check they land on E (catches transcription/order errors).
    from . import spec as cspec

    cs: CurveSpec = getattr(cspec, curve_name)()
    p = cs.fp.modulus
    pf = PF(p)
    checked = 0
    x = 1
    while checked < 3:
        gx = (pow(x, 3, p) + A * x + B) % p
        if pf.legendre(gx) == 1:
            y = pf.sqrt(gx)
            X, Y = _iso_host(iso, p, x, y)
            assert (Y * Y - X**3 - cs.a * X - cs.b) % p == 0, (
                f"{curve_name}: isogeny image not on E"
            )
            checked += 1
        x += 1
    return A, B, Z, iso


def _eval_poly_host(coeffs: list[int], p: int, x: int, monic: bool) -> int:
    acc = coeffs[-1] % p
    if monic:
        acc = (acc + x) % p
    for c in reversed(coeffs[:-1]):
        acc = (acc * x + c) % p
    return acc


def _iso_host(iso, p, x, y):
    xn = _eval_poly_host(iso["x_num"], p, x, False)
    xd = _eval_poly_host(iso["x_den"], p, x, True)
    yn = _eval_poly_host(iso["y_num"], p, x, False)
    yd = _eval_poly_host(iso["y_den"], p, x, True)
    X = (xn * pow(xd, -1, p)) % p
    Y = (y * yn * pow(yd, -1, p)) % p
    return X, Y


def _eval_poly(f, coeffs: list[int], x, monic: bool):
    """Batched Horner with host constants (g1EvalPolynomial analogue,
    ecc/bls12-377/hash_to_g1.go)."""
    batch = x.shape[1:]
    acc = mont.const(f, coeffs[-1], batch)
    if monic:
        acc = mont.add(f, acc, x)
    for c in reversed(coeffs[:-1]):
        acc = mont.add(f, mont.mul(f, acc, x), mont.const(f, c, batch))
    return acc


def map_to_curve_sswu(cs: CurveSpec, u: jnp.ndarray) -> Affine:
    """Batched SSWU map F_p -> E(F_p) (RFC 9380 F.2 + §6.6.3 isogeny;
    MapToCurve1 in ecc/bls12-381/hash_to_g1.go)."""
    f = cs.fp
    A, B, Z, iso = suite_g1(cs.name)
    batch = u.shape[1:]

    def C(v):
        return mont.const(f, v, batch)

    one = mont.one(f, batch)
    tv1 = mont.mul(f, mont.square(f, u), C(Z))        # Z u^2
    tv2 = mont.add(f, mont.square(f, tv1), tv1)       # Z^2 u^4 + Z u^2
    tv2_zero = mont.is_zero(f, tv2)
    # x1 = (-B/A) * (1 + 1/tv2)   [tv2 != 0];   B/(Z A)  [tv2 == 0]
    inv_tv2 = mont.inverse(f, tv2)                    # inv0
    x1 = mont.mul(
        f, C((-B * pow(A, -1, f.modulus)) % f.modulus),
        mont.add(f, one, inv_tv2),
    )
    x1 = mont.select(
        tv2_zero, C((B * pow(Z * A % f.modulus, -1, f.modulus)) % f.modulus), x1
    )

    def g(x):
        rhs = mont.add(f, mont.mul(f, mont.square(f, x), x), C(B))
        return mont.add(f, rhs, mont.mul(f, x, C(A)))

    gx1 = g(x1)
    x2 = mont.mul(f, tv1, x1)                          # Z u^2 x1
    gx2 = g(x2)
    r1, ok1 = mont.sqrt(f, gx1)
    r2, _ = mont.sqrt(f, gx2)
    xp = mont.select(ok1, x1, x2)
    yp = mont.select(ok1, r1, r2)
    # sign fix: sgn0(u) == sgn0(y)
    flip = (mont.from_mont(f, u)[0] & 1) != (mont.from_mont(f, yp)[0] & 1)
    yp = mont.select(flip, mont.neg(f, yp), yp)

    # isogeny E' -> E (batch-invert the two denominators together)
    xn = _eval_poly(f, iso["x_num"], xp, False)
    xd = _eval_poly(f, iso["x_den"], xp, True)
    yn = _eval_poly(f, iso["y_num"], xp, False)
    yd = _eval_poly(f, iso["y_den"], xp, True)
    dens = jnp.stack([xd, yd], axis=1)                 # (n_limbs, 2, *batch)
    invs = mont.batch_inverse(f, dens, axis=1)
    X = mont.mul(f, xn, invs[:, 0])
    Y = mont.mul(f, mont.mul(f, yp, yn), invs[:, 1])
    return Affine(X, Y)


# ---------------------------------------------------------------------------
# cofactor clearing (reference-exact effective cofactors)
# ---------------------------------------------------------------------------


def jac_mul_int(cs: CurveSpec, p: Jac, k: int) -> Jac:
    """[k]P for a host integer k (the mulWindowed analogue for fixed
    scalars, g1.go:486).  Small k unrolls at trace time; large k runs
    double-and-add under lax.scan over the static bit string so the trace
    stays two point-ops regardless of scalar size (compile-time control)."""
    import jax
    import numpy as np

    if k == 0:
        return jac_inf(cs, p.x.shape[1:])
    if k < 0:
        return jac_mul_int(cs, jac_neg(cs, p), -k)
    bits = bin(k)[2:]
    if len(bits) <= 16:
        acc = None
        for bit in bits:
            if acc is not None:
                acc = jac_double(cs, acc)
            if bit == "1":
                acc = p if acc is None else jac_add(cs, acc, p)
        return acc
    bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

    def body(acc, bit):
        acc = jac_double(cs, acc)
        added = jac_add(cs, acc, p)
        return jac_select(jnp.broadcast_to(bit, acc.x.shape[1:]), added, acc), None

    acc, _ = jax.lax.scan(body, p, bit_arr)
    return acc


def _phi(cs: CurveSpec, p: Jac) -> Jac:
    """GLV endomorphism (x, y) -> (beta*x, y) on Jacobian coords (g1.go:520)."""
    _, beta = cs.glv
    b = mont.const(cs.fp, beta, ())
    return Jac(mont.mul(cs.fp, p.x, b.reshape(cs.fp.n_limbs, *([1] * (p.x.ndim - 1)))),
               p.y, p.z)


def clear_cofactor(cs: CurveSpec, p: Jac) -> Jac:
    """Reference-exact G1 cofactor clearing per curve family."""
    name = cs.name
    if cs.cofactor == 1:
        return p
    if name.startswith("bls12") or name.startswith("bls24"):
        return jac_mul_int(cs, p, 1 - cs.seed)  # eprint 2019/403 §5
    if name == "bw6_761":
        x = cs.seed
        u1 = 103 * x**3 - 83 * x**2 - 40 * x + 136
        u2 = 7 * x**2 + 89 * x + 130
        return jac_add(
            cs, jac_mul_int(cs, p, u1), _phi(cs, jac_mul_int(cs, p, u2))
        )
    if name == "bw6_633":
        # ecc/bw6-633/g1.go:620 ClearCofactor (eprint 2020/351), scalar form.
        # NB the reference evaluates with xGen = |seed| = 3218079743 (the Go
        # code stores the absolute value and compensates signs explicitly).
        u = abs(cs.seed)
        vS = (u * u + 1) * (u + 1) * (u + 1)      # vP = [(1-(-u))·(u²+1)(u+1)]q
        wS = -(u - 1) * vS - u                    # wP = -(u-1)·vP + (-u)q
        L0 = 13 * wS + 7 * vS + 2
        L1 = 13 * (1 - u) + 5 * vS + 7
        return jac_add(
            cs, jac_mul_int(cs, p, L0), _phi(cs, jac_mul_int(cs, p, L1))
        )
    # fallback: full cofactor
    return jac_mul_int(cs, p, cs.cofactor)
