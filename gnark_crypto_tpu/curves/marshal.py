"""Point serialization, byte-compatible with the reference's conventions
(ecc/bn254/marshal.go:25-56 flag masks, :773+ G1 Bytes/SetBytes):

- compressed: fp.bytes bytes, MSB flags 0b10 (smallest y) / 0b11 (largest y) /
  0b01 (infinity); remaining bits = big-endian x.
- raw ("uncompressed"): 2*fp.bytes bytes, flags 0b00, x || y.

"LexicographicallyLargest" = y > (p-1)/2 (element.go:282).  Host-side codec
(protocol glue); batched device paths move limbs, not bytes."""

from __future__ import annotations

from ..fields.reference import PF
from .spec import CurveSpec

M_MASK = 0b11 << 6
M_UNCOMPRESSED = 0b00 << 6
M_COMPRESSED_SMALLEST = 0b10 << 6
M_COMPRESSED_LARGEST = 0b11 << 6
M_COMPRESSED_INFINITY = 0b01 << 6


def _lex_largest(y: int, p: int) -> bool:
    return y > (p - 1) // 2


def g1_to_bytes(cs: CurveSpec, P, raw: bool = False) -> bytes:
    nb = cs.fp.bytes
    p = cs.fp.modulus
    if raw:
        if P is None:
            return bytes(2 * nb)
        return P[0].to_bytes(nb, "big") + P[1].to_bytes(nb, "big")
    if P is None:
        out = bytearray(nb)
        out[0] = M_COMPRESSED_INFINITY
        return bytes(out)
    x, y = P
    out = bytearray(x.to_bytes(nb, "big"))
    flag = M_COMPRESSED_LARGEST if _lex_largest(y, p) else M_COMPRESSED_SMALLEST
    assert out[0] & M_MASK == 0, "x overflows flag bits"
    out[0] |= flag
    return bytes(out)


def g1_from_bytes(cs: CurveSpec, data: bytes, subgroup_check: bool = True):
    nb = cs.fp.bytes
    p = cs.fp.modulus
    pf = PF(p)
    flag = data[0] & M_MASK
    if flag == M_UNCOMPRESSED:
        assert len(data) >= 2 * nb
        x = int.from_bytes(data[:nb], "big")
        y = int.from_bytes(data[nb : 2 * nb], "big")
        if x == 0 and y == 0:
            return None
        P = (x, y)
    elif flag == M_COMPRESSED_INFINITY:
        rest = bytes([data[0] & ~M_MASK & 0xFF]) + data[1:nb]
        if any(rest):
            raise ValueError("invalid infinity encoding")
        return None
    else:
        buf = bytearray(data[:nb])
        buf[0] &= ~M_MASK & 0xFF
        x = int.from_bytes(bytes(buf), "big")
        y2 = (pow(x, 3, p) + cs.a * x + cs.b) % p
        y = pf.sqrt(y2)
        if y is None:
            raise ValueError("invalid point encoding: x not on curve")
        if _lex_largest(y, p) != (flag == M_COMPRESSED_LARGEST):
            y = p - y
        P = (x, y)
    if not cs.ref.is_on_curve(P):
        raise ValueError("point not on curve")
    if subgroup_check and cs.ref.mul(cs.fr.modulus, P) is not None:
        raise ValueError("point not in subgroup")
    return P
