"""Point serialization, byte-compatible with the reference's conventions
(ecc/bn254/marshal.go:25-56 flag masks, :773+ G1 Bytes/SetBytes, :1023+ G2):

- compressed: fp.bytes bytes (G1) / 2*fp.bytes (G2, stored X.A1 || X.A0),
  MSB flags 0b10 (smallest y) / 0b11 (largest y) / 0b01 (infinity);
  remaining bits = big-endian x.
- raw ("uncompressed"): doubled size, flags 0b00, x || y
  (G2: X.A1 || X.A0 || Y.A1 || Y.A0).

"LexicographicallyLargest" = y > (p-1)/2 (element.go:282); for Fp2, by A1
unless A1 == 0, then by A0 (fptower/e2.go:46).  Host-side codec (protocol
glue); batched device paths move limbs, not bytes."""

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
        if x >= p or y >= p:  # SetBytesCanonical: reject non-canonical limbs
            raise ValueError("coordinate not a canonical field element")
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
        if x >= p:
            raise ValueError("coordinate not a canonical field element")
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


# ---------------------------------------------------------------------------
# G2 (Fp2 coordinates) — marshal.go:1023+ conventions
# ---------------------------------------------------------------------------


def _sqrt_e2(h, a):
    """Host sqrt in Fp2 = Fp[u]/(u^2 - nr) via the norm ("complex") method;
    returns None for non-residues.  (The codec analogue of E2.Sqrt.)"""
    p = h.p
    pf = PF(p)
    a0, a1 = a
    nr = h.nr if isinstance(h.nr, int) else None
    assert nr is not None, "host Fp2 expected"
    nr %= p
    if a1 == 0:
        r = pf.sqrt(a0)
        if r is not None:
            return (r, 0)
        # a0 = nr * x^2 case: sqrt is x*u
        r = pf.sqrt(a0 * pow(nr, -1, p) % p)
        if r is None:
            return None
        return (0, r)
    norm = (a0 * a0 - nr * a1 * a1) % p
    lam = pf.sqrt(norm)
    if lam is None:
        return None
    inv2 = pow(2, -1, p)
    for l in (lam, p - lam):
        t = (a0 + l) * inv2 % p
        x0 = pf.sqrt(t)
        if x0 is not None and x0 != 0:
            x1 = a1 * pow(2 * x0 % p, -1, p) % p
            return (x0, x1)
    return None


def _lex_largest_e2(y, p: int) -> bool:
    y0, y1 = y
    if y1 == 0:
        return _lex_largest(y0, p)
    return _lex_largest(y1, p)


def g2_to_bytes(g, P, raw: bool = False) -> bytes:
    """G2Affine.Bytes/RawBytes (marshal.go:1023+).  g: curves/g2.py Group;
    P: host ((x0,x1),(y0,y1)) or None."""
    h = g.ops.host
    nb = g.ops.spec.bytes
    if raw:
        if P is None:
            return bytes(4 * nb)
        (x0, x1), (y0, y1) = P
        return (x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big")
                + y1.to_bytes(nb, "big") + y0.to_bytes(nb, "big"))
    if P is None:
        out = bytearray(2 * nb)
        out[0] = M_COMPRESSED_INFINITY
        return bytes(out)
    (x0, x1), y = P
    out = bytearray(x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big"))
    flag = (M_COMPRESSED_LARGEST if _lex_largest_e2(y, h.p)
            else M_COMPRESSED_SMALLEST)
    assert out[0] & M_MASK == 0, "x overflows flag bits"
    out[0] |= flag
    return bytes(out)


def g2_from_bytes(g, data: bytes, subgroup_check: bool = True):
    """G2Affine.SetBytes (marshal.go:1100+): decompress (host Fp2 sqrt),
    curve membership + optional subgroup check."""
    h = g.ops.host
    p = h.p
    nb = g.ops.spec.bytes
    hc = g.host_curve
    flag = data[0] & M_MASK
    if flag == M_UNCOMPRESSED:
        assert len(data) >= 4 * nb
        x1 = int.from_bytes(data[:nb], "big")
        x0 = int.from_bytes(data[nb:2 * nb], "big")
        y1 = int.from_bytes(data[2 * nb:3 * nb], "big")
        y0 = int.from_bytes(data[3 * nb:4 * nb], "big")
        if any(c >= p for c in (x0, x1, y0, y1)):  # SetBytesCanonical
            raise ValueError("coordinate not a canonical field element")
        if x0 == x1 == y0 == y1 == 0:
            return None
        P = ((x0, x1), (y0, y1))
    elif flag == M_COMPRESSED_INFINITY:
        rest = bytes([data[0] & ~M_MASK & 0xFF]) + data[1:2 * nb]
        if any(rest):
            raise ValueError("invalid infinity encoding")
        return None
    else:
        buf = bytearray(data[:2 * nb])
        buf[0] &= ~M_MASK & 0xFF
        x1 = int.from_bytes(bytes(buf[:nb]), "big")
        x0 = int.from_bytes(bytes(buf[nb:]), "big")
        if x0 >= p or x1 >= p:
            raise ValueError("coordinate not a canonical field element")
        x = (x0, x1)
        y2 = h.add(h.mul(h.square(x), x), g._h(g.b))
        if not g.a_is_zero:
            y2 = h.add(y2, h.mul(g._h(g.a), x))
        y = _sqrt_e2(h, y2)
        if y is None:
            raise ValueError("invalid point encoding: x not on curve")
        if _lex_largest_e2(y, p) != (flag == M_COMPRESSED_LARGEST):
            y = h.neg(y)
        P = (x, tuple(c % p for c in y))
    if not hc.is_on_curve(P):
        raise ValueError("point not on curve")
    if subgroup_check and hc.mul(g.fr.modulus, P) is not None:
        raise ValueError("point not in subgroup")
    return P
