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
        m_dev = mont.from_ints(spec, m)  # (n_limbs, n_polys, d)
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


def new_rsis(field_name: str, seed: int, log_two_degree: int,
             log_two_bound: int, max_elements: int) -> RSis:
    """NewRSis (sis.go:47): key A_i drawn from a seeded PRNG (our own
    derivation — the hash family is the same, the sampled key differs from the
    reference's Go PRNG)."""
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
    # key
    rng = np.random.default_rng(seed)
    A = rng.integers(0, 2**63, size=(n_polys, d), dtype=np.int64).astype(object)
    A = np.vectorize(lambda v: int(v) % q, otypes=[object])(A)
    a_dev = mont.from_ints(spec, A)
    psi_pows = powers(spec, psi, d)
    tw = mont.mul(spec, a_dev, psi_pows[:, None, :])
    import jax

    key_evals = jax.vmap(lambda x: ntt(domain, x), in_axes=1, out_axes=1)(tw)
    return RSis(spec=spec, degree=d, log_two_bound=log_two_bound,
                n_polys=n_polys, key_evals=key_evals, domain=domain, psi=psi)
