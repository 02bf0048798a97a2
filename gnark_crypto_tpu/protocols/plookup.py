"""Plookup lookup argument (ia.cr/2020/315), KZG-committed.

Mirrors ecc/bn254/fr/plookup/vector.go (ProveLookupVector :345,
VerifyLookupVector :553): sorted-multiset s = merge(f, t) in t-order, halves
h1/h2 with one overlapping element, grand product Z, quotient on a coset, KZG
openings at zeta and omega*zeta.

Device work: the sorted-multiset construction, batched ratio grand product
(batch inverse + associative scan), coset NTTs for the quotient, and the KZG
MSMs.  Identities enforced (paper eqs. a-d):
  (a) L_1(x)(Z(x)-1) = 0
  (b) (x-w^{n-1}) Z(x) (1+b)(g+f(x))(g(1+b)+t(x)+b t(wx))
      = (x-w^{n-1}) Z(wx) (g(1+b)+h1(x)+b h1(wx))(g(1+b)+h2(x)+b h2(wx))
  (c) L_{n-1}(x)(h1(x) - h2(wx)) = 0
  (d) L_{n-1}(x)(Z(x) - 1) = 0
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..commit import kzg
from ..curves.spec import CurveSpec
from ..fft import Domain, intt, ntt
from ..fft.domain import powers as dev_powers
from ..fiatshamir.transcript import Transcript
from ..fields import mont
from ..fields.reference import PF


@dataclasses.dataclass
class PlookupProof:
    n: int
    comms: dict
    openings: dict          # values at zeta
    openings_shift: dict    # values at omega*zeta
    batch_proof: kzg.BatchOpeningProof
    shift_proofs: dict      # name -> OpeningProof at omega*zeta


def _sorted_multiset(f: list[int], t: list[int]) -> list[int]:
    """s = f ∪ t ordered by t (duplicates adjacent), |s| = |f|+|t|."""
    order = {v: i for i, v in enumerate(t)}
    return sorted(list(f) + list(t), key=lambda v: order[v])


def prove(cs: CurveSpec, tw, srs: kzg.SRS, f: list[int], t: list[int]):
    fr = cs.fr
    q = fr.modulus
    n = len(t)
    assert len(f) == n - 1
    assert set(f) <= set(t), "lookup witness not contained in table"
    domain = Domain(fr, n)
    s = _sorted_multiset(f, t)
    h1, h2 = s[:n], s[n - 1:]
    f_pad = list(f) + [f[-1]]  # value at the excluded last point

    fv = mont.from_ints(fr, f_pad)
    tv = mont.from_ints(fr, t)
    h1v = mont.from_ints(fr, h1)
    h2v = mont.from_ints(fr, h2)

    F = intt(domain, fv)
    T = intt(domain, tv)
    H1 = intt(domain, h1v)
    H2 = intt(domain, h2v)
    comms = {
        k: kzg._to_host_point(cs, kzg.commit(cs, srs.pk, P))
        for k, P in (("F", F), ("T", T), ("H1", H1), ("H2", H2))
    }
    tr = Transcript("sha256", ["beta", "gamma", "alpha", "zeta"])
    for k in ("F", "T", "H1", "H2"):
        tr.bind("beta", str(comms[k]).encode())
    beta = tr.challenge_scalar("beta", q)
    gamma = tr.challenge_scalar("gamma", q)

    # grand product Z on device
    pf = PF(q)
    gp = gamma * (1 + beta) % q
    shift = lambda a: jnp.roll(a, -1, axis=1)  # a(w x) values
    one_b = mont.const(fr, (1 + beta) % q, (1,))
    gpc = mont.const(fr, gp, (1,))
    gc = mont.const(fr, gamma, (1,))
    bc = mont.const(fr, beta, (1,))
    num = mont.mul(
        fr,
        mont.mul(fr, one_b, mont.add(fr, gc, fv)),
        mont.add(fr, mont.add(fr, gpc, tv), mont.mul(fr, bc, shift(tv))),
    )
    den = mont.mul(
        fr,
        mont.add(fr, mont.add(fr, gpc, h1v), mont.mul(fr, bc, shift(h1v))),
        mont.add(fr, mont.add(fr, gpc, h2v), mont.mul(fr, bc, shift(h2v))),
    )
    ratio = mont.mul(fr, num, mont.batch_inverse(fr, den, axis=1))
    prefix = jax.lax.associative_scan(lambda x, y: mont.mul(fr, x, y), ratio, axis=1)
    zv = jnp.concatenate([mont.one(fr, (1,)), prefix[:, :-1]], axis=1)
    Z = intt(domain, zv)
    comms["Z"] = kzg._to_host_point(cs, kzg.commit(cs, srs.pk, Z))
    tr.bind("alpha", str(comms["Z"]).encode())
    alpha = tr.challenge_scalar("alpha", q)

    # quotient on 4n coset
    big = Domain(fr, 4 * n)
    N = big.cardinality

    def on_coset(coeffs):
        padded = jnp.concatenate([coeffs, mont.zeros(fr, (N - coeffs.shape[1],))], 1)
        return ntt(big, padded, coset=True)

    w = domain.generator
    wpow = dev_powers(fr, w, n)

    def shift_poly(P):
        return mont.mul(fr, P, wpow)

    Fc, Tc, H1c, H2c, Zc = map(on_coset, (F, T, H1, H2, Z))
    Twc, H1wc, H2wc, Zwc = map(
        on_coset, (shift_poly(T), shift_poly(H1), shift_poly(H2), shift_poly(Z))
    )
    xs = mont.mul(
        fr, dev_powers(fr, big.generator, N),
        mont.const(fr, big.fr_multiplicative_gen, (1,)),
    )
    one = mont.one(fr, (N,))
    xn = mont.pow_const(fr, xs, n)
    wlast = pow(w, n - 1, q)
    x_minus_wl = mont.sub(fr, xs, mont.const(fr, wlast, (1,)))
    lhs_b = mont.mul(
        fr,
        mont.mul(fr, Zc, mont.mul(fr, one_b, mont.add(fr, gc, Fc))),
        mont.add(fr, mont.add(fr, gpc, Tc), mont.mul(fr, bc, Twc)),
    )
    rhs_b = mont.mul(
        fr,
        mont.mul(
            fr, Zwc,
            mont.add(fr, mont.add(fr, gpc, H1c), mont.mul(fr, bc, H1wc)),
        ),
        mont.add(fr, mont.add(fr, gpc, H2c), mont.mul(fr, bc, H2wc)),
    )
    ident_b = mont.mul(fr, x_minus_wl, mont.sub(fr, lhs_b, rhs_b))
    # L1 and L_{n-1} on coset
    l1 = mont.mul(
        fr, mont.sub(fr, xn, one),
        mont.batch_inverse(
            fr, mont.mul_const(fr, mont.sub(fr, xs, one), n), axis=1
        ),
    )
    llast = mont.mul(
        fr,
        mont.mul(fr, mont.sub(fr, xn, one), mont.const(fr, wlast, (1,))),
        mont.batch_inverse(fr, mont.mul_const(fr, x_minus_wl, n), axis=1),
    )
    zm1 = mont.sub(fr, Zc, one)
    ident_a = mont.mul(fr, l1, zm1)
    ident_c = mont.mul(fr, llast, mont.sub(fr, H1c, H2wc))
    ident_d = mont.mul(fr, llast, zm1)
    ac = mont.const(fr, alpha, (1,))
    total = ident_b
    for ident in (ident_a, ident_c, ident_d):
        total = mont.add(fr, mont.mul(fr, total, ac), ident)
    van_inv = mont.batch_inverse(fr, mont.sub(fr, xn, one), axis=1)
    H = intt(big, mont.mul(fr, total, van_inv), coset=True)
    comms["H"] = kzg._to_host_point(cs, kzg.commit(cs, srs.pk, H))
    tr.bind("zeta", str(comms["H"]).encode())
    zeta = tr.challenge_scalar("zeta", q)

    polys = {"F": F, "T": T, "H1": H1, "H2": H2, "Z": Z, "H": H}
    names = list(polys)
    batch = kzg.batch_open_single_point(
        cs, srs.pk, [polys[k] for k in names], zeta, [comms[k] for k in names]
    )
    openings = dict(zip(names, batch.claimed_values))
    wz = zeta * w % q
    shift_names = ["T", "H1", "H2", "Z"]
    shift_proofs = {k: kzg.open_(cs, srs.pk, polys[k], wz) for k in shift_names}
    openings_shift = {k: p.claimed_value for k, p in shift_proofs.items()}
    return PlookupProof(
        n=n, comms=comms, openings=openings, openings_shift=openings_shift,
        batch_proof=batch, shift_proofs=shift_proofs,
    )


@dataclasses.dataclass
class LookupTablesProof:
    """ProofLookupTables (table.go:27): per-row commitments + folded inner
    vector proof + permutation proof that the folded table was sorted."""

    fs: list                 # per-row commitments of f
    ts: list                 # per-row commitments of t
    folded: PlookupProof
    perm: object             # permutation.PermutationProof


def _pad_to(vals: list[int], n: int) -> list[int]:
    return list(vals) + [vals[-1]] * (n - len(vals))


def prove_lookup_tables(cs: CurveSpec, tw, srs: kzg.SRS,
                        f: list[list[int]], t: list[list[int]]):
    """ProveLookupTables (table.go:52): f's columns (f[:][i] across rows) must
    each equal some column of t.  Rows are committed, folded with a
    Fiat-Shamir lambda, and the folded vectors go through the vector prover;
    sortedness of the folded table is a permutation proof."""
    from . import permutation

    fr = cs.fr
    q = fr.modulus
    assert len(f) == len(t) and f
    assert all(len(fi) == len(f[0]) for fi in f)
    assert all(len(ti) == len(t[0]) for ti in t)
    nb_rows = len(t)
    n_cols = max(len(f[0]) + 1, len(t[0]))
    domain = Domain(fr, n_cols)
    n = domain.cardinality

    lfs = [_pad_to(fi, n) for fi in f]
    lts = [_pad_to(ti, n) for ti in t]
    fs_comms, ts_comms = [], []
    for row in lfs:
        P = intt(domain, mont.from_ints(fr, row))
        fs_comms.append(kzg._to_host_point(cs, kzg.commit(cs, srs.pk, P)))
    for row in lts:
        P = intt(domain, mont.from_ints(fr, row))
        ts_comms.append(kzg._to_host_point(cs, kzg.commit(cs, srs.pk, P)))

    tr = Transcript("sha256", ["lambda"])
    for cpt in fs_comms + ts_comms:
        tr.bind("lambda", str(cpt).encode())
    lam = tr.challenge_scalar("lambda", q)

    # fold rows by Horner from the LAST row (table.go:141)
    foldedf = [0] * n
    foldedt = [0] * n
    for i in range(n):
        for j in range(nb_rows - 1, -1, -1):
            foldedf[i] = (foldedf[i] * lam + lfs[j][i]) % q
            foldedt[i] = (foldedt[i] * lam + lts[j][i]) % q

    sorted_t = sorted(foldedt)
    sigma = sorted(range(n), key=lambda i: foldedt[i])  # sorted_t = foldedt∘sigma
    perm_proof, _ = permutation.prove(cs, tw, srs, sigma, foldedt)
    folded = prove(cs, tw, srs, foldedf[: n - 1], foldedt)
    return LookupTablesProof(fs=fs_comms, ts=ts_comms, folded=folded,
                             perm=perm_proof)


def verify_lookup_tables(cs: CurveSpec, tw, srs: kzg.SRS,
                         proof: LookupTablesProof) -> bool:
    """VerifyLookupTables (table.go:169): re-derive lambda, check the folded
    f-commitment matches the inner proof, verify the permutation proof and
    the inner vector proof."""
    from . import permutation

    fr = cs.fr
    q = fr.modulus
    if len(proof.fs) != len(proof.ts) or not proof.fs:
        return False                      # malformed: empty commitment lists
    tr = Transcript("sha256", ["lambda"])
    for cpt in proof.fs + proof.ts:
        tr.bind("lambda", str(cpt).encode())
    lam = tr.challenge_scalar("lambda", q)

    # fold the row commitments by Horner from the last row (table.go:196)
    comf = proof.fs[-1]
    comt = proof.ts[-1]
    for i in range(len(proof.fs) - 2, -1, -1):
        comf = cs.ref.add(cs.ref.mul(lam, comf), proof.fs[i])
        comt = cs.ref.add(cs.ref.mul(lam, comt), proof.ts[i])
    if comf != proof.folded.comms["F"]:
        return False
    if comt != proof.perm.comms["A"]:
        return False
    if not permutation.verify(cs, tw, srs, proof.perm):
        return False
    return verify(cs, tw, srs, proof.folded)


def verify(cs: CurveSpec, tw, srs: kzg.SRS, proof: PlookupProof) -> bool:
    fr = cs.fr
    q = fr.modulus
    pf = PF(q)
    comms = proof.comms
    tr = Transcript("sha256", ["beta", "gamma", "alpha", "zeta"])
    for k in ("F", "T", "H1", "H2"):
        tr.bind("beta", str(comms[k]).encode())
    beta = tr.challenge_scalar("beta", q)
    gamma = tr.challenge_scalar("gamma", q)
    tr.bind("alpha", str(comms["Z"]).encode())
    alpha = tr.challenge_scalar("alpha", q)
    tr.bind("zeta", str(comms["H"]).encode())
    zeta = tr.challenge_scalar("zeta", q)

    names = list(proof.openings)
    if not kzg.batch_verify_single_point(
        tw, cs, srs.vk, [comms[k] for k in names], proof.batch_proof, zeta
    ):
        return False
    n = proof.n
    domain = Domain(fr, n)
    w = domain.generator
    wz = zeta * w % q
    for k, p in proof.shift_proofs.items():
        if p.claimed_value != proof.openings_shift[k]:
            return False
        if not kzg.verify(tw, cs, srs.vk, comms[k], p, wz):
            return False

    o, osh = proof.openings, proof.openings_shift
    gp = gamma * (1 + beta) % q
    wlast = pow(w, n - 1, q)
    zn = pow(zeta, n, q)
    l1 = (zn - 1) * pf.inv(n * (zeta - 1) % q) % q
    llast = (zn - 1) * wlast % q * pf.inv(n * (zeta - wlast) % q) % q
    lhs_b = (o["Z"] * (1 + beta) % q * ((gamma + o["F"]) % q) % q
             * ((gp + o["T"] + beta * osh["T"]) % q)) % q
    rhs_b = (osh["Z"] * ((gp + o["H1"] + beta * osh["H1"]) % q) % q
             * ((gp + o["H2"] + beta * osh["H2"]) % q)) % q
    ident_b = (zeta - wlast) % q * ((lhs_b - rhs_b) % q) % q
    ident_a = l1 * ((o["Z"] - 1) % q) % q
    ident_c = llast * ((o["H1"] - osh["H2"]) % q) % q
    ident_d = llast * ((o["Z"] - 1) % q) % q
    total = ident_b
    for ident in (ident_a, ident_c, ident_d):
        total = (total * alpha + ident) % q
    return total == o["H"] * ((zn - 1) % q) % q
