"""Permutation argument (PLONK-style grand product), proving t2 = t1 ∘ sigma.

Mirrors ecc/bn254/fr/permutation/permutation.go (Prove :124 / Verify :265):
commit A, B, the labeling polynomials S_id/S_sigma, the grand-product Z and
the quotient H; open at zeta (and Z additionally at omega*zeta); verify the
PLONK permutation identity from the openings.

Device work: NTTs, the batched ratio construction (batch inverse +
associative-scan prefix product — BuildRatioShuffledVectors, iop/ratios.go:45),
and the KZG MSMs.  Transcript/host glue is scalar."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..commit import kzg
from ..curves.spec import CurveSpec
from ..fft import Domain, intt, ntt
from ..fiatshamir.transcript import Transcript
from ..fields import mont
from ..fields.reference import PF


@dataclasses.dataclass
class PermutationProof:
    n: int                # domain size (public)
    comms: dict           # name -> host G1 point
    openings_z: dict      # name -> value at zeta (ints)
    z_shift_opening: int  # Z at omega*zeta
    batch_proof: kzg.BatchOpeningProof
    z_shift_proof: kzg.OpeningProof


def _grand_product_z(cs, domain, a_vals, b_vals, id_vals, sig_vals, beta, gamma):
    """Z[0]=1, Z[i+1] = Z[i] * (a_i + beta*id_i + gamma)/(b_i + beta*sig_i + gamma),
    built with one batch inverse + an associative-scan prefix product."""
    fr = cs.fr
    bta = mont.const(fr, beta, (1,))
    gma = mont.const(fr, gamma, (1,))
    num = mont.add(fr, mont.add(fr, a_vals, mont.mul(fr, bta, id_vals)), gma)
    den = mont.add(fr, mont.add(fr, b_vals, mont.mul(fr, bta, sig_vals)), gma)
    ratio = mont.mul(fr, num, mont.batch_inverse(fr, den, axis=1))
    prefix = jax.lax.associative_scan(
        lambda x, y: mont.mul(fr, x, y), ratio, axis=1
    )
    # Z = [1, prefix[0], ..., prefix[n-2]]
    one = mont.one(fr, (1,))
    return jnp.concatenate([one, prefix[:, :-1]], axis=1)


def prove(cs: CurveSpec, tw, srs: kzg.SRS, sigma: list[int], t1: list[int]
          ) -> tuple[PermutationProof, dict]:
    fr = cs.fr
    q = fr.modulus
    n = len(t1)
    domain = Domain(fr, n)
    t2 = [t1[sigma[i]] for i in range(n)]

    a_vals = mont.from_ints(fr, t1)
    b_vals = mont.from_ints(fr, t2)
    id_vals = mont.from_ints(fr, list(range(n)))
    sig_vals = mont.from_ints(fr, sigma)

    # canonical coefficients
    A = intt(domain, a_vals)
    B = intt(domain, b_vals)
    Sid = intt(domain, id_vals)
    Ssig = intt(domain, sig_vals)

    comms = {
        "A": kzg._to_host_point(cs, kzg.commit(cs, srs.pk, A)),
        "B": kzg._to_host_point(cs, kzg.commit(cs, srs.pk, B)),
        "Sid": kzg._to_host_point(cs, kzg.commit(cs, srs.pk, Sid)),
        "Ssig": kzg._to_host_point(cs, kzg.commit(cs, srs.pk, Ssig)),
    }
    t = Transcript("sha256", ["beta", "gamma", "alpha", "zeta"])
    for name in ("A", "B", "Sid", "Ssig"):
        t.bind("beta", str(comms[name]).encode())
    beta = t.challenge_scalar("beta", q)
    gamma = t.challenge_scalar("gamma", q)

    z_vals = _grand_product_z(cs, domain, a_vals, b_vals, id_vals, sig_vals,
                              beta, gamma)
    Z = intt(domain, z_vals)
    comms["Z"] = kzg._to_host_point(cs, kzg.commit(cs, srs.pk, Z))
    t.bind("alpha", str(comms["Z"]).encode())
    alpha = t.challenge_scalar("alpha", q)

    # quotient: [Z(wX)*den(X) - Z(X)*num(X) + alpha * L1(X)(Z(X)-1)] / (X^n-1)
    # computed on a 2n coset (degree of numerator < 3n)
    big = Domain(fr, 4 * n)
    pf = PF(q)

    def on_coset(coeffs):
        padded = jnp.concatenate(
            [coeffs, mont.zeros(fr, (big.cardinality - coeffs.shape[1],))], axis=1
        )
        return ntt(big, padded, coset=True)

    Ac, Bc, Sidc, Ssigc, Zc = map(on_coset, (A, B, Sid, Ssig, Z))
    # Z(w X) on coset: shift Z's coefficients by powers of w before eval
    from ..fft.domain import powers as dpowers

    wpow = dpowers(fr, domain.generator, n)
    Zw = mont.mul(fr, Z, wpow)
    Zwc = on_coset(Zw)

    bta = mont.const(fr, beta, (1,))
    gma = mont.const(fr, gamma, (1,))
    num = mont.add(fr, mont.add(fr, Ac, mont.mul(fr, bta, Sidc)), gma)
    den = mont.add(fr, mont.add(fr, Bc, mont.mul(fr, bta, Ssigc)), gma)
    main = mont.sub(fr, mont.mul(fr, Zwc, den), mont.mul(fr, Zc, num))
    # L1 on coset: L1 = (X^n - 1) / (n (X - 1))
    gmul = big.fr_multiplicative_gen
    xs = dpowers(fr, big.generator, big.cardinality)
    xs = mont.mul(fr, xs, mont.const(fr, gmul, (1,)))
    xn = mont.pow_const(fr, xs, n)
    one = mont.one(fr, (big.cardinality,))
    l1 = mont.mul(
        fr,
        mont.sub(fr, xn, one),
        mont.batch_inverse(
            fr,
            mont.mul_const(fr, mont.sub(fr, xs, one), n),
            axis=1,
        ),
    )
    zm1 = mont.sub(fr, Zc, one)
    total = mont.add(fr, main, mont.mul(fr, mont.const(fr, alpha, (1,)),
                                        mont.mul(fr, l1, zm1)))
    # divide by (X^n - 1) on the coset
    van_inv = mont.batch_inverse(fr, mont.sub(fr, xn, one), axis=1)
    hc = mont.mul(fr, total, van_inv)
    H = intt(big, hc, coset=True)
    comms["H"] = kzg._to_host_point(cs, kzg.commit(cs, srs.pk, H))
    t.bind("zeta", str(comms["H"]).encode())
    zeta = t.challenge_scalar("zeta", q)

    polys = {"A": A, "B": B, "Sid": Sid, "Ssig": Ssig, "Z": Z, "H": H}
    names = list(polys)
    batch = kzg.batch_open_single_point(
        cs, srs.pk, [polys[k] for k in names], zeta,
        [comms[k] for k in names],
    )
    omega_zeta = zeta * domain.generator % q
    zshift = kzg.open_(cs, srs.pk, Z, omega_zeta)
    openings = dict(zip(names, batch.claimed_values))
    proof = PermutationProof(
        n=n,
        comms=comms,
        openings_z=openings,
        z_shift_opening=zshift.claimed_value,
        batch_proof=batch,
        z_shift_proof=zshift,
    )
    return proof, {"beta": beta, "gamma": gamma, "alpha": alpha, "zeta": zeta,
                   "domain": domain}


def verify(cs: CurveSpec, tw, srs: kzg.SRS, proof: PermutationProof) -> bool:
    fr = cs.fr
    q = fr.modulus
    pf = PF(q)
    comms = proof.comms
    t = Transcript("sha256", ["beta", "gamma", "alpha", "zeta"])
    for name in ("A", "B", "Sid", "Ssig"):
        t.bind("beta", str(comms[name]).encode())
    beta = t.challenge_scalar("beta", q)
    gamma = t.challenge_scalar("gamma", q)
    t.bind("alpha", str(comms["Z"]).encode())
    alpha = t.challenge_scalar("alpha", q)
    t.bind("zeta", str(comms["H"]).encode())
    zeta = t.challenge_scalar("zeta", q)

    names = list(proof.openings_z)
    if not kzg.batch_verify_single_point(
        tw, cs, srs.vk, [comms[k] for k in names], proof.batch_proof, zeta
    ):
        return False
    n = proof.n
    domain = Domain(fr, n)
    if not kzg.verify(
        tw, cs, srs.vk, comms["Z"], proof.z_shift_proof,
        zeta * domain.generator % q,
    ):
        return False
    o = proof.openings_z
    z_shift = proof.z_shift_opening
    zn = pow(zeta, n, q)
    l1 = (zn - 1) * pf.inv(n * (zeta - 1) % q) % q
    num = (o["A"] + beta * o["Sid"] + gamma) % q
    den = (o["B"] + beta * o["Ssig"] + gamma) % q
    main = (z_shift * den - o["Z"] * num) % q
    lhs = (main + alpha * l1 % q * ((o["Z"] - 1) % q)) % q
    rhs = o["H"] * ((zn - 1) % q) % q
    return lhs == rhs
