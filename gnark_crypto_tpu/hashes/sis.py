"""Ring-SIS hash over Z_q[X]/(X^d + 1) — field/babybear/sis/sis.go:21-287.

hash(m) = sum_i A_i * m_i in the negacyclic ring, with the message split into
logTwoBound-bit limbs.  Negacyclic convolution = psi-twist + cyclic NTT
(the reference evaluates on the coset sqrt(g)*<g>, same thing): all device,
fully batched over polynomials."""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..fft import Domain, intt, ntt
from ..fft.domain import powers
from ..fields import mont
from ..fields.fields import get_spec
from ..fields.spec import FieldSpec


@dataclasses.dataclass
class RSis:
    spec: FieldSpec
    degree: int           # d of X^d + 1
    log_two_bound: int
    n_polys: int
    key_evals: jnp.ndarray  # (n_limbs, n_polys, d) — NTT(psi-twisted A_i)
    domain: Domain
    psi: int              # 2d-th root of unity (psi^2 = domain generator)

    def hash_elements(self, elements: list[int]) -> list[int]:
        """Split canonical field-element bytes into logTwoBound-bit limbs,
        interpret groups of d limbs as ring polynomials, return the d ring
        coefficients of sum_i A_i * m_i."""
        spec = self.spec
        bits_per = self.log_two_bound
        limbs_per_elem = spec.bytes * 8 // bits_per
        coeffs = []
        for e in elements:
            for j in range(limbs_per_elem):
                coeffs.append((e >> (j * bits_per)) & ((1 << bits_per) - 1))
        total = self.n_polys * self.degree
        coeffs += [0] * (total - len(coeffs))
        assert len(coeffs) == total
        m = np.array(coeffs, dtype=object).reshape(self.n_polys, self.degree)
        # gnark writes each limb RAW into the Montgomery word of the ring
        # coefficient (InnerHash, sis.go:181: k[j][0] = l), so the coefficient
        # VALUE is l * R^-1 mod q; our storage radix 2^(16*n_limbs) equals the
        # reference's R for every supported field, so raw limb placement
        # (mont=False) reproduces it bit-exactly.
        m_dev = mont.from_ints(spec, m, mont=False)  # (n_limbs, n_polys, d)
        # psi-twist each polynomial, batched cyclic NTT, pointwise mul with
        # key evals, sum over polys, inverse NTT, untwist
        psi_pows = powers(spec, self.psi, self.degree)  # (n_limbs, d)
        tw = mont.mul(spec, m_dev, psi_pows[:, None, :])
        import jax

        ev = jax.vmap(lambda x: ntt(self.domain, x), in_axes=1, out_axes=1)(tw)
        prod = mont.mul(spec, ev, self.key_evals)
        acc = mont.sum_axis(spec, prod, axis=1)  # (n_limbs, d)
        res = intt(self.domain, acc)
        psi_inv = powers(spec, pow(self.psi, -1, spec.modulus), self.degree)
        res = mont.mul(spec, res, psi_inv)
        return [int(v) for v in mont.to_ints(spec, res)]


def _derive_random_element(seed: int, i: int, j: int, q: int) -> int:
    """deriveRandomElementFromSeed (sis.go:197): blake2b-256 of
    "SIS" || be64(seed) || be64(i) || be64(j), reduced mod q (SetBytes
    semantics: big-endian integer mod q) — bit-exact with the reference."""
    import hashlib

    buf = (b"SIS" + (seed & (2**64 - 1)).to_bytes(8, "big")
           + (i & (2**64 - 1)).to_bytes(8, "big")
           + (j & (2**64 - 1)).to_bytes(8, "big"))
    dg = hashlib.blake2b(buf, digest_size=32).digest()
    return int.from_bytes(dg, "big") % q


def sage_deterministic_key(q: int, seed: int, n_polys: int, d: int):
    """The reference test suite's deterministic key (sis_test.go:145
    makeKeyDeterministic / sis.py poly_pseudo_rand): polynomial i's
    coefficients are the iterated squares of (seed + i)."""
    A = np.empty((n_polys, d), dtype=object)
    for i in range(n_polys):
        s = (seed + i) % q
        for j in range(d):
            s = s * s % q
            A[i, j] = s
    return A


def new_rsis(field_name: str, seed: int, log_two_degree: int,
             log_two_bound: int, max_elements: int,
             key: str = "blake2b") -> RSis:
    """NewRSis (sis.go:47): key A_i derived with the reference's seeded
    blake2b PRNG (sis.go:197) by default, so hashes are bit-compatible with
    gnark; key="sage" selects the reference test suite's deterministic key
    (pinned by tests/vectors/sis_*.json, copied from the reference's
    Sage-generated test_cases.json)."""
    spec = get_spec(field_name)
    d = 1 << log_two_degree
    assert log_two_bound % 8 == 0
    limbs_per_elem = spec.bytes * 8 // log_two_bound
    n = limbs_per_elem * max_elements
    n_polys = -(-n // d)
    domain = Domain(spec, d, with_coset_tables=False)
    # psi: 2d-th root with psi^2 = domain generator
    q = spec.modulus
    psi = pow(spec.multiplicative_generator, (q - 1) // (2 * d), q)
    assert pow(psi, 2, q) == domain.generator  # psi^2 generates <w_d>
    assert pow(psi, d, q) == q - 1             # psi^d = -1 (negacyclic twist)
    # key: gnark-exact derivation per (polynomial, coefficient)
    if key == "sage":
        A = sage_deterministic_key(q, seed, n_polys, d)
    else:
        A = np.array(
            [[_derive_random_element(seed, i, j, q) for j in range(d)]
             for i in range(n_polys)], dtype=object)
    a_dev = mont.from_ints(spec, A)
    psi_pows = powers(spec, psi, d)
    tw = mont.mul(spec, a_dev, psi_pows[:, None, :])
    import jax

    key_evals = jax.vmap(lambda x: ntt(domain, x), in_axes=1, out_axes=1)(tw)
    return RSis(spec=spec, degree=d, log_two_bound=log_two_bound,
                n_polys=n_polys, key_evals=key_evals, domain=domain, psi=psi)
