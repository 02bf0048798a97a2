from .domain import Domain, powers
from .fft import DIF, DIT, bit_reverse, bit_reverse_indices, fft, fft_inverse, intt, ntt

__all__ = [
    "Domain",
    "powers",
    "DIF",
    "DIT",
    "bit_reverse",
    "bit_reverse_indices",
    "fft",
    "fft_inverse",
    "ntt",
    "intt",
]
