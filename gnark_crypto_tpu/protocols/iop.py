"""IOP polynomial layer: polynomials with tracked (Basis, Layout) form.

Mirrors fr/iop/polynomial.go:20-60 (Form = Basis x Layout) and the conversion
methods :265-392 (ToRegular/ToBitReverse/ToLagrange/ToCanonical/
ToLagrangeCoset), plus expression evaluation (expressions.go:16) and the
X^n - 1 quotient on a coset (quotient.go:21)."""

from __future__ import annotations

import dataclasses
import enum

import jax

from ..fft import DIF, DIT, Domain, bit_reverse, fft, fft_inverse
from ..fields import mont
from ..fields.spec import FieldSpec


class Basis(enum.Enum):
    CANONICAL = 0
    LAGRANGE = 1
    LAGRANGE_COSET = 2


class Layout(enum.Enum):
    REGULAR = 0
    BIT_REVERSE = 1


@dataclasses.dataclass
class Polynomial:
    """coeffs: (n_limbs, N) mont fr array + form tracking."""

    coeffs: jax.Array
    basis: Basis
    layout: Layout
    spec: FieldSpec
    shift: int = 0  # Shift view (polynomial.go:82)

    @property
    def size(self) -> int:
        return self.coeffs.shape[1]

    def clone(self) -> "Polynomial":
        return dataclasses.replace(self)

    # ---- layout conversions ----

    def to_regular(self, domain: Domain) -> "Polynomial":
        if self.layout is Layout.REGULAR:
            return self
        return dataclasses.replace(
            self, coeffs=bit_reverse(self.coeffs, axis=1), layout=Layout.REGULAR
        )

    def to_bit_reverse(self, domain: Domain) -> "Polynomial":
        if self.layout is Layout.BIT_REVERSE:
            return self
        return dataclasses.replace(
            self, coeffs=bit_reverse(self.coeffs, axis=1), layout=Layout.BIT_REVERSE
        )

    # ---- basis conversions (polynomial.go:265-392 semantics) ----

    def to_lagrange(self, domain: Domain) -> "Polynomial":
        p = self
        if p.basis is Basis.LAGRANGE:
            return p
        assert p.basis is Basis.CANONICAL, "coset -> lagrange goes via canonical"
        if p.layout is Layout.REGULAR:
            c = fft(domain, p.coeffs, DIF)
            return dataclasses.replace(p, coeffs=c, basis=Basis.LAGRANGE,
                                       layout=Layout.BIT_REVERSE)
        c = fft(domain, p.coeffs, DIT)
        return dataclasses.replace(p, coeffs=c, basis=Basis.LAGRANGE,
                                   layout=Layout.REGULAR)

    def to_canonical(self, domain: Domain) -> "Polynomial":
        p = self
        if p.basis is Basis.CANONICAL:
            return p
        coset = p.basis is Basis.LAGRANGE_COSET
        if p.layout is Layout.REGULAR:
            c = fft_inverse(domain, p.coeffs, DIF, coset=coset)
            return dataclasses.replace(p, coeffs=c, basis=Basis.CANONICAL,
                                       layout=Layout.BIT_REVERSE)
        c = fft_inverse(domain, p.coeffs, DIT, coset=coset)
        return dataclasses.replace(p, coeffs=c, basis=Basis.CANONICAL,
                                   layout=Layout.REGULAR)

    def to_lagrange_coset(self, domain: Domain) -> "Polynomial":
        p = self.to_canonical(domain) if self.basis is not Basis.CANONICAL else self
        if p.basis is Basis.LAGRANGE_COSET:
            return p
        if p.layout is Layout.REGULAR:
            c = fft(domain, p.coeffs, DIF, coset=True)
            return dataclasses.replace(p, coeffs=c, basis=Basis.LAGRANGE_COSET,
                                       layout=Layout.BIT_REVERSE)
        c = fft(domain, p.coeffs, DIT, coset=True)
        return dataclasses.replace(p, coeffs=c, basis=Basis.LAGRANGE_COSET,
                                   layout=Layout.REGULAR)

    def shifted(self, shift: int) -> "Polynomial":
        """Shift view (polynomial.go:82): flags the polynomial as
        p(w^shift X) without touching the data."""
        return dataclasses.replace(self, shift=shift)

    def blind(self, order: int, rng=None) -> "Polynomial":
        """PLONK-style blinding: p <- p + b(X) * (X^n - 1) with b a random
        polynomial of degree `order`, extending the coefficient vector to
        size n + order + 1.  Evaluations on the size-n domain (where
        X^n = 1) are unchanged, but any `order+1` openings leak nothing
        about p.  This is the `blindedSize` operation gnark's iop layer
        tracks (polynomial.go:60; the upstream method was folded into
        backend/plonk) — exposed here because every PLONK-style consumer
        needs it.  Requires canonical/regular form."""
        assert self.basis is Basis.CANONICAL and self.layout is Layout.REGULAR
        assert 0 <= order < self.size
        import secrets

        import jax.numpy as jnp

        q = self.spec.modulus
        n = self.size
        draw = (rng if rng is not None
                else (lambda: secrets.randbelow(q)))
        b = [draw() for _ in range(order + 1)]
        # p + b(X)*(X^n - 1): coeffs [p0..p_{n-1}, 0...] - [b, 0...] +
        # [0]*n ++ b
        ext = mont.from_ints(self.spec, b)                  # (L, order+1)
        coeffs = jnp.pad(self.coeffs, ((0, 0), (0, order + 1)))
        lo = mont.sub(self.spec, coeffs[:, : order + 1], ext)
        coeffs = jnp.concatenate(
            [lo, coeffs[:, order + 1 : n], ext], axis=1)
        return dataclasses.replace(self, coeffs=coeffs)

    def evaluate(self, x: int, domain: Domain | None = None) -> int:
        """Single-point evaluation (polynomial.go:105 Evaluate semantics:
        a nonzero shift evaluates p at w^shift * x)."""
        assert self.basis is Basis.CANONICAL and self.layout is Layout.REGULAR
        from ..fft.domain import powers

        q = self.spec.modulus
        if self.shift:
            if domain is None:
                domain = Domain(self.spec, self.size)
            x = x * pow(domain.generator, self.shift, q) % q
        pw = powers(self.spec, x, self.size)
        v = mont.inner_product(self.spec, self.coeffs, pw, axis=1)
        return int(mont.to_ints(self.spec, v[:, None])[0])

    # ---- serialization (polynomial.go:393 WriteTo / :430 ReadFrom) ----

    def to_bytes(self) -> bytes:
        """Coefficients (big-endian canonical, element-major) followed by
        (basis, layout, shift, size) as uint32.  NB this is an INTERNAL
        format: gnark's Polynomial.WriteTo (polynomial.go:393) additionally
        writes a uint32 vector-length prefix and a trailing coset field, so
        the bytes are not wire-compatible with the reference."""
        import numpy as np

        ints = mont.to_ints(self.spec, self.coeffs)
        nb = self.spec.bytes
        body = b"".join(int(v).to_bytes(nb, "big") for v in ints)
        meta = b"".join(
            int(v).to_bytes(4, "big")
            for v in (self.basis.value, self.layout.value, self.shift,
                      self.size)
        )
        return body + meta

    @classmethod
    def from_bytes(cls, spec: FieldSpec, data: bytes) -> "Polynomial":
        nb = spec.bytes
        meta = data[-16:]
        body = data[:-16]
        basis, layout, shift, size = (
            int.from_bytes(meta[4 * i : 4 * i + 4], "big") for i in range(4)
        )
        assert len(body) == size * nb
        vals = [int.from_bytes(body[i * nb : (i + 1) * nb], "big")
                for i in range(size)]
        return cls(coeffs=mont.from_ints(spec, vals), basis=Basis(basis),
                   layout=Layout(layout), spec=spec, shift=shift)


def evaluate_expression(spec: FieldSpec, fn, *polys: Polynomial) -> jax.Array:
    """Pointwise combination of same-form polynomials
    (iop Evaluate, expressions.go:16): fn takes the coefficient arrays."""
    forms = {(p.basis, p.layout) for p in polys}
    assert len(forms) == 1, "polynomials must share a form"
    return fn(*[p.coeffs for p in polys])


def divide_by_x_minus_one(spec: FieldSpec, num_coset: jax.Array,
                          small_domain: Domain, big_domain: Domain) -> jax.Array:
    """h / (X^n - 1) evaluated on the big coset (quotient.go:21): multiply by
    the precomputed inverse of the vanishing polynomial on the coset."""
    n_small = small_domain.cardinality
    n_big = big_domain.cardinality
    g = big_domain.fr_multiplicative_gen
    q = spec.modulus
    w = big_domain.generator
    # vanishing values: (g w^i)^n - 1, i = 0..n_big-1; w^(n_small * i) cycles
    from ..fft.domain import powers

    wn = pow(w, n_small, q)
    gn = pow(g, n_small, q)
    vals = powers(spec, wn, n_big)  # w^(n i)
    gn_c = mont.const(spec, gn, (1,))
    van = mont.mul(spec, vals, gn_c)
    one = mont.one(spec, (n_big,))
    van = mont.sub(spec, van, one)
    van_inv = mont.batch_inverse(spec, van, axis=1)
    return mont.mul(spec, num_coset, van_inv)
