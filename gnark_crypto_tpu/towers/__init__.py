from .reference import (
    E2 as RefE2,
    E6 as RefE6,
    E12 as RefE12,
    PairingOracle,
    TowerSpec,
    bls12_377_tower,
    bls12_381_tower,
    bn254_tower,
)
from .tower import E2, E6, E12, Tower, tower

__all__ = [
    "RefE2",
    "RefE6",
    "RefE12",
    "PairingOracle",
    "TowerSpec",
    "bn254_tower",
    "bls12_381_tower",
    "bls12_377_tower",
    "E2",
    "E6",
    "E12",
    "Tower",
    "tower",
]
