from .domain import Domain, powers
from .fft import DIF, DIT, bit_reverse, bit_reverse_indices, fft, fft_inverse, intt, ntt
from .pallas_ntt import fused_available, ntt_fused

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
    "ntt_fused",
    "fused_available",
]
