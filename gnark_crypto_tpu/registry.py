"""Curve-agnostic facade — the L5 registries of the reference:

- ecc.ID enum + Implemented() + ScalarField/BaseField (ecc/ecc.go:25-70)
- kzg.NewSRS(id) dispatch (kzg/kzg.go:38-59)
- hash registry (hash/hashes.go:19 RegisterHash / New)
- signature registry (signature/signature.go:13-58)
"""

from __future__ import annotations

import enum
import functools


class ID(enum.Enum):
    UNKNOWN = 0
    BN254 = 1
    BLS12_377 = 2
    BLS12_381 = 3
    BLS24_315 = 4
    BLS24_317 = 5
    BW6_761 = 6
    BW6_633 = 7
    STARK_CURVE = 8
    SECP256K1 = 9


_CURVES = {
    ID.BN254: "bn254",
    ID.BLS12_377: "bls12_377",
    ID.BLS12_381: "bls12_381",
    ID.BLS24_315: "bls24_315",
    ID.BLS24_317: "bls24_317",
    ID.BW6_761: "bw6_761",
    ID.BW6_633: "bw6_633",
    ID.SECP256K1: "secp256k1",
    ID.STARK_CURVE: "stark_curve",
}

_PAIRING_CURVES = {
    ID.BN254, ID.BLS12_377, ID.BLS12_381,
    ID.BLS24_315, ID.BLS24_317, ID.BW6_761, ID.BW6_633,
}


def implemented() -> list[ID]:
    """ecc.Implemented() — curves with a working curve spec this round."""
    return sorted(_CURVES, key=lambda i: i.value)


def curve(id_: ID):
    from . import curves as c

    return getattr(c, _CURVES[id_])()


def scalar_field(id_: ID) -> int:
    return curve(id_).fr.modulus


def base_field(id_: ID) -> int:
    return curve(id_).fp.modulus


_SPECIALIZED_PAIRING = {ID.BN254, ID.BLS12_377, ID.BLS12_381}


def pairing_tower(id_: ID):
    """Specialized E12 Tower context (bn/bls12 families)."""
    assert id_ in _SPECIALIZED_PAIRING, f"{id_} uses pairing_stack()"
    from .pairing import pairing_ctx

    return pairing_ctx(_CURVES[id_])


def pairing_stack(id_: ID):
    """Generic flat-Ops pairing stack — available for every pairing curve
    (pairing/ate.py)."""
    assert id_ in _PAIRING_CURVES, f"{id_} has no pairing"
    from .towers.stacks import stack

    return stack(_CURVES[id_])


def new_srs(id_: ID, size: int, tau: int):
    """kzg.NewSRS facade (kzg/kzg.go:38) — works for every pairing curve
    (specialized Tower for bn/bls12, generic PairingStack otherwise)."""
    from .commit import kzg as _kzg

    cs = curve(id_)
    tw = (
        pairing_tower(id_)
        if id_ in _SPECIALIZED_PAIRING
        else pairing_stack(id_)
    )
    return _kzg.new_srs(cs, tw, size, tau)


# ---- hash registry --------------------------------------------------------

_HASHES: dict[str, callable] = {}


def register_hash(name: str, factory):
    _HASHES[name] = factory


def new_hash(name: str):
    if name not in _HASHES:
        raise KeyError(
            f"hash {name} not registered; known: {sorted(_HASHES)}"
        )
    return _HASHES[name]()


@functools.cache
def _register_defaults():
    from .hashes.mimc import mimc
    from .hashes.poseidon2 import poseidon2

    for field in (
        "bn254_fr", "bls12_381_fr", "bls12_377_fr", "bw6_761_fr",
        "bls24_315_fr", "bls24_317_fr", "bw6_633_fr",
    ):
        register_hash(f"MIMC_{field.upper()}", functools.partial(mimc, field))
    register_hash("POSEIDON2_BN254", poseidon2)
    return True


_register_defaults()


# ---- signature registry ---------------------------------------------------

_SIGNERS: dict[str, dict] = {}


def register_signature(name: str, module):
    _SIGNERS[name] = module


@functools.cache
def _register_signers():
    from .signatures import ecdsa, eddsa

    register_signature("ECDSA", ecdsa)
    register_signature("EDDSA", eddsa)
    return True


_register_signers()


def signature_scheme(name: str):
    return _SIGNERS[name]
