"""KZG polynomial commitment (device MSM/eval + host protocol glue).

Mirrors ecc/bn254/kzg/kzg.go: SRS :72, Commit :159, Open :180, Verify :207,
BatchOpenSinglePoint :246, BatchVerifySinglePoint :385, deriveGamma :531,
dividePolyByXminusA :567.  TPU design notes:

- Commit/Open quotient MSMs and the quotient/eval computations are batched
  device kernels (MSM = msm.msm; quotient division uses a reverse prefix sum
  instead of serial synthetic division);
- transcript math, G2 side (two tiny points), and the final pairing inputs are
  host ints — latency-bound scalar work stays off the device
  (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import point as gp
from ..curves.fixed_base import batch_scalar_mul_fixed_base
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fft.domain import powers
from ..msm.msm import msm
from ..pairing import g2_from_ints, pairing_check, pairing_ctx
from ..towers.reference import twist_curve
from ..towers.stacks import PairingStack


def _g2_host(tw):
    """(host twist curve, g2 generator) for either pairing context: the
    specialized Tower (bn/bls12) or the generic PairingStack (all curves)."""
    if isinstance(tw, PairingStack):
        from ..towers.host import HostCurve

        h = tw.host_tf
        b = tw.b_twist if not isinstance(tw.b_twist, int) else h.embed(tw.b_twist)
        gx, gy = tw.g2_gen
        if isinstance(gx, int):
            gx, gy = h.embed(gx), h.embed(gy)
        return HostCurve(h, b), (gx, gy)
    tc = twist_curve(tw.ts)
    return tc, (tw.ts.g2x, tw.ts.g2y)


import functools


@functools.cache
def _jitted_check_stack(tw):
    from ..pairing import ate

    return jax.jit(lambda p, q: ate.pairing_check(tw, p, q))


@functools.cache
def _fixed_q_ctx(curve_name: str):
    """(stack, jitted fixed-Q pairing check) for curves with a fixed-Q path
    (PairFixedQ, bn254/pairing.go:26); None where unsupported (bw6)."""
    from ..pairing import lines as fl
    from ..pairing.ate import pairing_stack

    st = pairing_stack(curve_name)
    if not fl.supports_fixed_q(st):
        return None
    fn = jax.jit(lambda p, d1, d3, a1, a3: fl.pairing_check_fixed(
        st, p, fl.FixedQLines(d1, d3, a1, a3)))
    return st, fn


@functools.cache
def _fixed_q_lines(curve_name: str, q_key):
    """Cached per-(curve, host Q) precomputed Miller lines."""
    from ..pairing import lines as fl
    from ..pairing.ate import pairing_stack

    return fl.precompute_lines(pairing_stack(curve_name), q_key)


def _verify_pairs_fixed_q(cs: CurveSpec, g1_pts, g2_pts) -> bool:
    """prod e(P_i, Q_i) == 1 through the fixed-Q stack path: lines for each
    (fixed, per-VK) Q are precomputed host-side and cached."""
    from ..pairing import lines as fl

    st, fn = _fixed_q_ctx(cs.name)
    lines = fl.stack_lines(
        [_fixed_q_lines(cs.name, q) for q in g2_pts])
    p_dev = gp.affine_from_ints(cs, g1_pts)
    return bool(np.asarray(fn(
        p_dev, jnp.asarray(lines.dbl_a1), jnp.asarray(lines.dbl_a3),
        jnp.asarray(lines.add_a1), jnp.asarray(lines.add_a3))))


@functools.cache
def _jitted_check_tower(tw):
    return jax.jit(lambda p, q: pairing_check(tw, p, q))


def _device_pairing_check(tw, cs: CurveSpec, g1_pts, g2_pts) -> bool:
    """prod e(P_i, Q_i) == 1 with host point lists, on either context.

    The pairing graph is jitted once per (context, batch-shape) and cached
    module-wide — point values arrive as arrays, so repeated Verify calls
    (each with different host ints) reuse the compiled executable instead of
    re-tracing (SURVEY.md §7 hard part #4)."""
    if isinstance(tw, PairingStack):
        from ..curves import group as grp
        from ..curves.g2 import g2_group

        g2g = g2_group(cs.name)
        p_dev = gp.affine_from_ints(cs, g1_pts)
        q_dev = grp.affine_from_host(g2g, g2_pts)
        return bool(np.asarray(_jitted_check_stack(tw)(p_dev, q_dev)))
    p_dev = gp.affine_from_ints(cs, g1_pts)
    q_dev = g2_from_ints(tw, g2_pts)
    return bool(np.asarray(_jitted_check_tower(tw)(p_dev, q_dev)))


@dataclasses.dataclass
class ProvingKey:
    g1: gp.Affine  # device SoA, [G, tauG, tau^2 G, ...]


@dataclasses.dataclass
class VerifyingKey:
    g1: tuple            # host affine generator
    g2: tuple            # (G2, [tau]G2) host affine E2 pairs
    curve: str


@dataclasses.dataclass
class SRS:
    pk: ProvingKey
    vk: VerifyingKey


@dataclasses.dataclass
class OpeningProof:
    h: tuple             # host affine quotient commitment
    claimed_value: int


def new_srs(cs: CurveSpec, tw, size: int, tau: int) -> SRS:
    """Test/bench SRS from a known tau (kzg.go:72 NewSRS(size, bAlpha))."""
    r = cs.fr.modulus
    tau %= r
    taus = []
    t = 1
    for _ in range(size):
        taus.append(t)
        t = t * tau % r
    scalars = mont.from_ints(cs.fr, taus, mont=False)
    pk_jac = batch_scalar_mul_fixed_base(cs, cs.generator, scalars)
    pk_aff = gp.jac_to_affine(cs, pk_jac)
    tc, g2 = _g2_host(tw)
    tau_g2 = tc.mul(tau, g2)
    return SRS(
        pk=ProvingKey(g1=pk_aff),
        vk=VerifyingKey(g1=cs.generator, g2=(g2, tau_g2), curve=cs.name),
    )


def digest(cs: CurveSpec, j: gp.Jac):
    """Host affine digest of a device commitment (the Digest type of
    kzg.go:64 — commitments travel as affine points)."""
    aff = gp.jac_to_affine(cs, jax.tree.map(lambda a: a[..., None], j))
    return gp.affine_to_ints(cs, aff).reshape(-1)[0]


_to_host_point = digest  # backwards-compat alias


def commit(cs: CurveSpec, pk: ProvingKey, poly: jax.Array) -> gp.Jac:
    """Commit = MSM(pk.G1[:len(p)], p) (kzg.go:159).  poly: mont fr coeffs
    (n_limbs, N).  Large commitments on TPU route through the rounds-based
    Pallas MSM (msm/pallas_msm.py); the exact segmented-scan path remains
    the CPU/test route."""
    n = poly.shape[1]
    scalars = mont.from_mont(cs.fr, poly)
    pts = gp.Affine(pk.g1.x[:, :n], pk.g1.y[:, :n])
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu and n >= (1 << 12):
        from ..msm.pallas_msm import msm_fast

        return msm_fast(cs, pts, scalars)
    return msm(cs, pts, scalars)


def eval_poly(cs: CurveSpec, poly: jax.Array, a: int) -> int:
    """p(a) via device powers + inner product (kzg.go:55 eval)."""
    fr = cs.fr
    n = poly.shape[1]
    pw = powers(fr, a % fr.modulus, n)
    v = mont.inner_product(fr, poly, pw, axis=1)
    return int(mont.to_ints(fr, v[:, None])[0])


def _quotient(cs: CurveSpec, poly: jax.Array, a: int, y: int) -> jax.Array:
    """(p - y) / (X - a) as mont fr coeffs of length N-1
    (dividePolyByXminusA, kzg.go:567) — parallel form:
    q_i = sum_{j>i} p_j a^(j-i-1) = a^(-i-1) * suffix_i+1(p_j a^j)  (a != 0)
    q_i = p_(i+1)                                                    (a == 0)
    """
    fr = cs.fr
    r = fr.modulus
    n = poly.shape[1]
    a %= r
    if a == 0:
        return poly[:, 1:]
    pw = powers(fr, a, n)                       # a^j
    t = mont.mul(fr, poly, pw)                  # p_j a^j
    suffix = jax.lax.associative_scan(
        lambda x, y_: mont.add(fr, x, y_), t, axis=1, reverse=True
    )                                           # s_i = sum_{j>=i} p_j a^j
    ainv = pow(a, -1, r)
    pw_inv = powers(fr, ainv, n)                # a^(-i)
    ainv_c = mont.const(fr, ainv, (1,))
    # q_i = s_{i+1} * a^(-i) * a^(-1), i = 0..n-2
    q = mont.mul(fr, mont.mul(fr, suffix[:, 1:], pw_inv[:, : n - 1]), ainv_c)
    return q


def open_(cs: CurveSpec, pk: ProvingKey, poly: jax.Array, a: int) -> OpeningProof:
    """Open (kzg.go:180): claimed value + commitment to the quotient."""
    y = eval_poly(cs, poly, a)
    q = _quotient(cs, poly, a, y)
    h = commit(cs, pk, q)
    return OpeningProof(h=_to_host_point(cs, h), claimed_value=y)


def verify(tw, cs: CurveSpec, vk: VerifyingKey, commitment, proof: OpeningProof,
           a: int) -> bool:
    """Verify (kzg.go:207): e(H, [tau - a]G2) * e(C - yG1, -G2) == 1.

    When the curve has a fixed-Q path, the point `a` is folded into the G1
    side —  e(H, [tau]G2) * e(yG1 - C - aH, G2) == 1  — so BOTH G2 arguments
    are the per-VK constants and their Miller-loop lines come precomputed
    (PairFixedQ, bn254/pairing.go:26); otherwise the generic 2-pair check."""
    r = cs.fr.modulus
    g2, tau_g2 = vk.g2
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    # fixed-Q on the TPU path; CPU/test sessions keep the single generic
    # pairing graph (compiling BOTH graphs would double the CPU suite's
    # dominant compile cost; tests/test_pairing_fixed.py covers fixed-Q)
    if on_tpu and _fixed_q_ctx(cs.name) is not None:
        y_minus_c = cs.ref.add(
            cs.ref.mul(proof.claimed_value % r, vk.g1),
            cs.ref.neg(commitment))
        lhs = cs.ref.add(y_minus_c, cs.ref.mul((-a) % r, proof.h))
        return _verify_pairs_fixed_q(cs, [proof.h, lhs], [tau_g2, g2])
    tc, _ = _g2_host(tw)
    # [tau - a]G2 = tauG2 + (-a)G2
    g2_shift = tc.add(tau_g2, tc.mul((-a) % r, g2))
    c_minus_y = cs.ref.add(commitment, cs.ref.mul((-proof.claimed_value) % r,
                                                  vk.g1))
    neg_g2 = tc.neg(g2)
    return _device_pairing_check(
        tw, cs, [proof.h, c_minus_y], [g2_shift, neg_g2]
    )


def derive_gamma(a: int, digests, claimed_values, modulus: int) -> int:
    """deriveGamma (kzg.go:531): gamma = H("gamma", a, digests..., values...)."""
    h = hashlib.sha256()
    h.update(b"gamma")
    h.update(a.to_bytes(48, "big"))
    for d in digests:
        if d is None:
            h.update(b"\x00" * 96)
        else:
            h.update(int(d[0]).to_bytes(48, "big") + int(d[1]).to_bytes(48, "big"))
    for v in claimed_values:
        h.update(int(v).to_bytes(48, "big"))
    return int.from_bytes(h.digest(), "big") % modulus


@dataclasses.dataclass
class BatchOpeningProof:
    h: tuple
    claimed_values: list


def batch_open_single_point(cs: CurveSpec, pk: ProvingKey, polys, a: int,
                            digests) -> BatchOpeningProof:
    """BatchOpenSinglePoint (kzg.go:246): gamma-fold polys, one quotient."""
    fr = cs.fr
    r = fr.modulus
    ys = [eval_poly(cs, p, a) for p in polys]
    gamma = derive_gamma(a, digests, ys, r)
    # folded = sum gamma^i p_i ; folded value = sum gamma^i y_i
    n = max(p.shape[1] for p in polys)
    acc = None
    g = 1
    for p, y in zip(polys, ys):
        gc = mont.const(fr, g, (1,))
        term = mont.mul(fr, p, gc)
        if p.shape[1] < n:
            term = jnp.concatenate(
                [term, mont.zeros(fr, (n - p.shape[1],))], axis=1
            )
        acc = term if acc is None else mont.add(fr, acc, term)
        g = g * gamma % r
    y_fold = 0
    g = 1
    for y in ys:
        y_fold = (y_fold + g * y) % r
        g = g * gamma % r
    q = _quotient(cs, acc, a, y_fold)
    h = commit(cs, pk, q)
    return BatchOpeningProof(h=_to_host_point(cs, h), claimed_values=ys)


def fold_proof(cs: CurveSpec, digests, proof: BatchOpeningProof, a: int):
    """FoldProof (kzg.go:341): fold a batch proof and its digests into one
    (OpeningProof, folded_digest) pair — the verifier-side fold with no
    pairing work."""
    r = cs.fr.modulus
    assert len(digests) == len(proof.claimed_values)
    gamma = derive_gamma(a, digests, proof.claimed_values, r)
    acc = None
    y_fold = 0
    g = 1
    for d, y in zip(digests, proof.claimed_values):
        acc = cs.ref.add(acc, cs.ref.mul(g, d))
        y_fold = (y_fold + g * y) % r
        g = g * gamma % r
    return OpeningProof(h=proof.h, claimed_value=y_fold), acc


def batch_verify_single_point(tw, cs: CurveSpec, vk: VerifyingKey, digests,
                              proof: BatchOpeningProof, a: int) -> bool:
    """BatchVerifySinglePoint (kzg.go:385): FoldProof then the standard
    check."""
    folded_proof, folded_digest = fold_proof(cs, digests, proof, a)
    return verify(tw, cs, vk, folded_digest, folded_proof, a)


def batch_verify_multi_points(tw, cs: CurveSpec, vk: VerifyingKey, digests,
                              proofs, points, rng=None) -> bool:
    """BatchVerifyMultiPoints (kzg.go:405): one pairing for many opening
    proofs at different points via a random linear combination:

      e(sum_i l_i (C_i - y_i G1 + a_i H_i), G2) . e(-sum_i l_i H_i, [tau]G2) == 1

    The folding coefficients default to OS entropy (the reference draws them
    from crypto/rand, kzg.go:418); pass an object with .bytes(n) (e.g. a
    seeded np.random.Generator) only for deterministic tests.
    """
    import secrets as _secrets

    assert len(digests) == len(proofs) == len(points)
    if len(digests) == 1:
        return verify(tw, cs, vk, digests[0], proofs[0], points[0])
    r = cs.fr.modulus
    draw = _secrets.token_bytes if rng is None else rng.bytes
    lambdas = [1] + [
        int.from_bytes(draw(2 * cs.fr.n_limbs), "big") % r
        for _ in range(len(digests) - 1)
    ]
    ref = cs.ref
    folded_quotients = None
    folded_digests = None
    y_fold = 0
    folded_pts_quot = None
    for lam, d, pr, a in zip(lambdas, digests, proofs, points):
        folded_quotients = ref.add(folded_quotients, ref.mul(lam, pr.h))
        folded_digests = ref.add(folded_digests, ref.mul(lam, d))
        y_fold = (y_fold + lam * pr.claimed_value) % r
        folded_pts_quot = ref.add(
            folded_pts_quot, ref.mul(lam * (a % r) % r, pr.h)
        )
    folded_digests = ref.add(
        folded_digests, ref.mul((-y_fold) % r, vk.g1)
    )
    folded_digests = ref.add(folded_digests, folded_pts_quot)
    folded_quotients = None if folded_quotients is None else (
        folded_quotients[0], (cs.fp.modulus - folded_quotients[1]) % cs.fp.modulus
    )
    g2, tau_g2 = vk.g2
    return _device_pairing_check(
        tw, cs, [folded_digests, folded_quotients], [g2, tau_g2]
    )
