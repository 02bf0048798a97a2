"""RFC 9380 hash-to-field: expand_message_xmd (SHA-256) + per-field Hash.

Mirrors field/hash/hashutils.go:8-18 (ExpandMsgXmd) and
ecc/bn254/fr/hash_to_field — host-side (byte churning, no device math)."""

from __future__ import annotations

import hashlib


def expand_msg_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    """RFC 9380 §5.3.1 with SHA-256."""
    h = hashlib.sha256
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255 or len(dst) > 255:
        raise ValueError("expand_msg_xmd: invalid parameters")
    dst_prime = dst + len(dst).to_bytes(1, "big")
    z_pad = b"\x00" * r_in_bytes
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = h(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b1 = h(b0 + b"\x01" + dst_prime).digest()
    out = [b1]
    for i in range(2, ell + 1):
        prev = out[-1]
        xored = bytes(a ^ b for a, b in zip(b0, prev))
        out.append(h(xored + i.to_bytes(1, "big") + dst_prime).digest())
    return b"".join(out)[:len_in_bytes]


def hash_to_field(msg: bytes, dst: bytes, modulus: int, count: int,
                  sec_bits: int = 128) -> list[int]:
    """RFC 9380 §5.2 (m=1): count elements of F_p (Element.Hash analogue,
    ecc/bn254/fp/element.go:712)."""
    L = -(-(modulus.bit_length() + sec_bits) // 8)
    uniform = expand_msg_xmd(msg, dst, count * L)
    return [
        int.from_bytes(uniform[i * L : (i + 1) * L], "big") % modulus
        for i in range(count)
    ]
