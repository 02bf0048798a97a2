"""goff-analogue CLI: derive all field constants for an arbitrary modulus.

The reference's goff (field/goff/main.go) generates a Go package per modulus;
here kernel specialization is trace-time, so the CLI just prints the derived
FieldSpec constants (Montgomery R/R^2, -q^-1, two-adicity, nonresidue, FFT
generator) and a smoke-test of the Montgomery core on that field.

Usage: python -m gnark_crypto_tpu.fields.goff -m <modulus> [-n name]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser(prog="goff")
    ap.add_argument("-m", "--modulus", required=True,
                    help="field modulus (decimal or 0x hex)")
    ap.add_argument("-n", "--name", default="custom")
    ap.add_argument("--smoke", action="store_true",
                    help="run a device smoke test of mont.mul on the field")
    args = ap.parse_args()
    modulus = int(args.modulus, 0)

    from .fields import custom

    spec = custom(args.name, modulus)
    out = {
        "name": spec.name,
        "modulus": spec.modulus,
        "bits": spec.bits,
        "n_limbs_16bit": spec.n_limbs,
        "r_mod_q": spec.r,
        "r2_mod_q": spec.r2,
        "qinv_neg_mod_2^16": spec.qinv_neg,
        "two_adicity": spec.two_adicity,
        "nonresidue": spec.nonresidue,
        "multiplicative_generator": spec.multiplicative_generator,
    }
    print(json.dumps({k: str(v) for k, v in out.items()}, indent=2))

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from . import mont

        a = mont.from_ints(spec, [3, 5, modulus - 1])
        b = mont.from_ints(spec, [7, 11, modulus - 1])
        prod = jax.jit(lambda x, y: mont.mul(spec, x, y))(a, b)
        got = [int(x) for x in mont.to_ints(spec, prod)]
        want = [21 % modulus, 55 % modulus, ((modulus - 1) ** 2) % modulus]
        assert got == want, f"smoke test failed: {got} != {want}"
        print("smoke test: ok")


if __name__ == "__main__":
    main()
