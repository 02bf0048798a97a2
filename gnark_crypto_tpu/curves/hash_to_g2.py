"""Hash-to-G2: extension-field SSWU + isogeny + ψ-based cofactor clearing.

Reference: ecc/bls12-381/hash_to_g2.go (MapToCurve2 :207, g2SqrtRatio :124,
g2Sgn0 :305, HashToG2 :365) and ecc/bls12-381/g2.go:627 ClearCofactor
(eprint 2017/419 §4.1).  RFC 9380 suites BLS12381G2_XMD:SHA-256_SSWU_RO_.

TPU-first differences from the reference:
- batched over the message axis: every map step is a vectorized field op;
- sqrt_ratio constants (c1..c7, draft-16 §F.2.1.1) are DERIVED from the
  field at trace time (host big-int math) instead of pasted Montgomery limb
  dumps — the goff-analogue specialization (SURVEY.md §2.1);
- the ψ endomorphism coefficients (ξ^((p-1)/3), ξ^((p-1)/2) for the sextic
  twist) are likewise derived and VERIFIED at import against ψ = [p] on G2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..hashes.hash_to_field import expand_msg_xmd
from ..towers.host import HostCurve
from ..towers.stacks import stack
from . import group as gp
from .g2 import g2_group
from .group import AffineF, Group, JacF
from .spec import CurveSpec
from .sswu_data import SUITES


# ---------------------------------------------------------------------------
# generic field helpers over an Ops object
# ---------------------------------------------------------------------------


def ext_pow(F, x, e: int):
    """x^e for a host integer exponent over any Ops field (scan over the
    static bit string; trace holds two multiplications)."""
    assert e >= 0
    if e == 0:
        return F.one(x.shape[1:])
    bits = bin(e)[2:]
    if len(bits) <= 8:
        acc = None
        for b in bits:
            if acc is not None:
                acc = F.square(acc)
            if b == "1":
                acc = x if acc is None else F.mul(acc, x)
        return acc
    bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

    def body(acc, bit):
        acc = F.square(acc)
        mul = F.mul(acc, x)
        return F.select(jnp.broadcast_to(bit, acc.shape[1:]), mul, acc), None

    acc, _ = jax.lax.scan(body, x, bit_arr)
    return acc


@functools.cache
def _sqrt_ratio_consts(F, Z_key):
    """Derive the RFC 9380 F.2.1.1 constants for field F and nonresidue Z.

    Z_key is the hashable host representation of Z (nested tuple / int)."""
    h = F.host
    deg = getattr(h, "degree_abs", 1)
    q = F.p ** deg
    c1 = 0
    t = q - 1
    while t % 2 == 0:
        c1 += 1
        t //= 2
    c2 = (q - 1) >> c1
    c3 = (c2 - 1) // 2
    c4 = (1 << c1) - 1
    c5 = 1 << (c1 - 1)
    Z = _unkey(Z_key)
    c6 = h.pow(Z, c2)
    c7 = h.pow(Z, (c2 + 1) // 2)
    return c1, c3, c4, c5, c6, c7


def _key(v):
    return tuple(_key(x) for x in v) if isinstance(v, (tuple, list)) else v


def _unkey(v):
    return tuple(_unkey(x) for x in v) if isinstance(v, tuple) else v


def sqrt_ratio(F, Z_host, u, v):
    """(is_qr, y): y = sqrt(u/v) if u/v is square else sqrt(Z*u/v).

    Generic any-field routine (draft-irtf-cfrg-hash-to-curve-16 §F.2.1.1;
    g2SqrtRatio in hash_to_g2.go:124).  Batched; v == 0 gives unspecified y.
    """
    c1, c3, c4, c5, c6, c7 = _sqrt_ratio_consts(F, _key(Z_host))
    batch = u.shape[1:]
    one = F.one(batch)
    tv1 = F.const(c6, batch)
    tv2 = ext_pow(F, v, c4)
    tv3 = F.mul(F.square(tv2), v)
    tv5 = ext_pow(F, F.mul(u, tv3), c3)
    tv5 = F.mul(tv5, tv2)
    tv2 = F.mul(tv5, v)
    tv3 = F.mul(tv5, u)
    tv4 = F.mul(tv3, tv2)
    tv5 = ext_pow(F, tv4, c5)
    is_qr = F.eq(tv5, one)
    tv2 = F.mul(tv3, F.const(c7, batch))
    tv5 = F.mul(tv4, tv1)
    tv3 = F.select(is_qr, tv3, tv2)
    tv4 = F.select(is_qr, tv4, tv5)
    for i in range(c1, 1, -1):
        tv5 = tv4
        for _ in range(i - 2):
            tv5 = F.square(tv5)
        e1 = F.eq(tv5, one)
        tv2 = F.mul(tv3, tv1)
        tv1 = F.square(tv1)
        tv5 = F.mul(tv4, tv1)
        tv3 = F.select(e1, tv3, tv2)
        tv4 = F.select(e1, tv4, tv5)
    return is_qr, tv3


def sgn0(F, x) -> jnp.ndarray:
    """RFC 9380 §4.1 sgn0 for F = Fp or an extension tower flattened to
    prime coordinates (g2Sgn0, hash_to_g2.go:305): lexicographic parity."""
    spec = F.spec if hasattr(F, "spec") else F
    comps = _prime_comps(F, x)
    sign = None
    zero = None
    for c in comps:
        c_plain = mont.from_mont(spec, c)
        s_i = (c_plain[0] & 1) == 1
        z_i = mont.is_zero(spec, c)
        if sign is None:
            sign, zero = s_i, z_i
        else:
            sign = jnp.logical_or(sign, jnp.logical_and(zero, s_i))
            zero = jnp.logical_and(zero, z_i)
    return sign


def _prime_comps(F, x):
    """Flatten an Ops element to its prime-field coordinate arrays."""
    if not hasattr(F, "split"):
        return [x]
    out = []
    for c in F.split(x):
        out.extend(_prime_comps(F.base, c))
    return out


# ---------------------------------------------------------------------------
# SSWU map over the twist field + isogeny
# ---------------------------------------------------------------------------


@functools.cache
def _suite_g2(curve_name: str):
    """Host A, B, Z, isogeny coefficients for <curve>_g2 (tf elements)."""
    s = SUITES[f"{curve_name}_g2"]

    def host_el(coords):
        if len(coords) == 1:
            return coords[0]
        return tuple(c % stack(curve_name).tf.p for c in coords)

    A = host_el(s["A"])
    B = host_el(s["B"])
    Z = host_el(s["Z"])
    iso = {k: [host_el(c) for c in v] for k, v in s["isogeny"].items()}
    return A, B, Z, iso


def _eval_poly_ext(F, coeffs, x, monic: bool):
    batch = x.shape[1:]
    acc = F.const(coeffs[-1], batch)
    if monic:
        acc = F.add(acc, x)
    for c in reversed(coeffs[:-1]):
        acc = F.add(F.mul(acc, x), F.const(c, batch))
    return acc


def map_to_curve_sswu_g2(curve_name: str, u) -> AffineF:
    """Batched SSWU F_tf -> E'(F_tf) -> E(F_tf) (MapToCurve2 + g2Isogeny,
    hash_to_g2.go:207/:104; RFC 9380 §F.2 straight line, inversion-free up
    to the final x/tv4 + isogeny denominators)."""
    st = stack(curve_name)
    F = st.tf
    A, B, Z, iso = _suite_g2(curve_name)
    batch = u.shape[1:]

    def C(v):
        return F.const(v, batch)

    one = F.one(batch)
    tv1 = F.mul(F.square(u), C(Z))                     # Z u^2
    tv2 = F.add(F.square(tv1), tv1)                    # Z^2 u^4 + Z u^2
    tv3 = F.mul(F.add(tv2, one), C(B))                 # B (tv2 + 1)
    tv2_zero = F.is_zero(tv2)
    tv4 = F.select(tv2_zero, C(Z), F.neg(tv2))
    tv4 = F.mul(tv4, C(A))                             # A * (Z | -tv2)
    tv2 = F.square(tv3)
    tv6 = F.square(tv4)
    tv5 = F.mul(tv6, C(A))
    tv2 = F.mul(F.add(tv2, tv5), tv3)                  # tv3^3 + A tv3 tv4^2
    tv6 = F.mul(tv6, tv4)                              # tv4^3
    tv5 = F.mul(tv6, C(B))
    tv2 = F.add(tv2, tv5)                              # g(x1) numerator
    x = F.mul(tv1, tv3)
    is_gx1, y1 = sqrt_ratio(F, Z, tv2, tv6)
    y = F.mul(F.mul(tv1, u), y1)
    x = F.select(is_gx1, tv3, x)
    y = F.select(is_gx1, y1, y)
    flip = sgn0(F, u) != sgn0(F, y)
    y = F.select(flip, F.neg(y), y)
    x = F.mul(x, F.inverse(tv4))

    # isogeny E' -> E
    xn = _eval_poly_ext(F, iso["x_num"], x, False)
    xd = _eval_poly_ext(F, iso["x_den"], x, True)
    yn = _eval_poly_ext(F, iso["y_num"], x, False)
    yd = _eval_poly_ext(F, iso["y_den"], x, True)
    X = F.mul(xn, F.inverse(xd))
    Y = F.mul(F.mul(y, yn), F.inverse(yd))
    return AffineF(X, Y)


# SVDW constants for curves whose G2 suite is Shallue-van de Woestijne
# (bn254: BN254G2_XMD:SHA-256_SVDW_; values are the canonical (non-Montgomery)
# forms of the constants in ecc/bn254/hash_to_g2.go:28-48, re-verified at
# import below: c1 = g(Z), c2 = -Z/2, c3 = sqrt(-g(Z)(3Z^2+4A)) with
# sgn0(c3) = 0, c4 = -4g(Z)/(3Z^2+4A)).
SVDW_G2 = {
    "bn254": {
        "Z": (1, 0),
        "c1": (19485874751759354771024239261021720505790618469301721065564631296452457478374,
               266929791119991161246907387137283842545076965332900288569378510910307636690),
        "c2": (10944121435919637611123202872628637544348155578648911831344518947322613104291, 0),
        "c3": (18992192239972082890849143911285057164064277369389217330423471574879236301292,
               21819008332247140148575583693947636719449476128975323941588917397607662637108),
        "c4": (10499238450719652342378357227399831140106360636427411350395554762472100376473,
               6940174569119770192419592065569379906172001098655407502803841283667998553941),
    },
}


@functools.cache
def _svdw_suite_g2(curve_name: str):
    """Verify the SVDW constants against their defining equations."""
    st = stack(curve_name)
    h = st.host_tf
    s = SVDW_G2[curve_name]
    Z, c1, c2, c3, c4 = (s[k] for k in ("Z", "c1", "c2", "c3", "c4"))
    b = st.b_twist
    g_z = h.add(h.mul(h.square(Z), Z), b)           # A = 0 on all our twists
    assert h.eq(c1, g_z), "c1 != g(Z)"
    assert h.eq(h.add(h.mul_small(c2, 2), Z), h.zero()), "c2 != -Z/2"
    t = h.mul_small(h.square(Z), 3)                  # 3Z^2 + 4A, A = 0
    assert h.eq(h.square(c3), h.neg(h.mul(g_z, t))), "c3^2 != -g(Z)(3Z^2+4A)"
    assert h.eq(h.mul(c4, t), h.neg(h.mul_small(g_z, 4))), "c4 defn"
    return Z, c1, c2, c3, c4


def map_to_curve_svdw_g2(curve_name: str, u) -> AffineF:
    """Batched Shallue-van de Woestijne map over the twist field
    (MapToCurve2, ecc/bn254/hash_to_g2.go:16; RFC 9380 §6.6.1 straight
    line with constant-time selects)."""
    st = stack(curve_name)
    F = st.tf
    Z, c1, c2, c3, c4 = _svdw_suite_g2(curve_name)
    batch = u.shape[1:]

    def C(v):
        return F.const(v, batch)

    b = C(st.b_twist)
    one = F.one(batch)
    tv1 = F.mul(F.square(u), C(c1))          # u^2 c1
    tv2 = F.add(one, tv1)                    # 1 + tv1
    tv1 = F.sub(one, tv1)                    # 1 - tv1
    tv3 = F.inverse(F.mul(tv1, tv2))         # inv0
    tv4 = F.mul(F.mul(F.mul(u, tv1), tv3), C(c3))
    x1 = F.sub(C(c2), tv4)
    gx1 = F.add(F.mul(F.square(x1), x1), b)
    x2 = F.add(C(c2), tv4)
    gx2 = F.add(F.mul(F.square(x2), x2), b)
    x3 = F.add(C(Z), F.mul(C(c4), F.square(F.mul(F.square(tv2), tv3))))
    gx3 = F.add(F.mul(F.square(x3), x3), b)

    e1, y1 = sqrt_ratio(F, st.xi, gx1, one)
    e2, y2 = sqrt_ratio(F, st.xi, gx2, one)
    _, y3 = sqrt_ratio(F, st.xi, gx3, one)
    e2 = jnp.logical_and(e2, jnp.logical_not(e1))

    x = F.select(e1, x1, x3)
    x = F.select(e2, x2, x)
    y = F.select(e1, y1, y3)
    y = F.select(e2, y2, y)
    flip = sgn0(F, u) != sgn0(F, y)
    y = F.select(flip, F.neg(y), y)
    return AffineF(x, y)


# ---------------------------------------------------------------------------
# ψ endomorphism + cofactor clearing (BLS families)
# ---------------------------------------------------------------------------


@functools.cache
def _psi_consts(curve_name: str):
    """(c_x, c_y) with ψ(x, y) = (frob(x)·c_x, frob(y)·c_y) on the twist.

    Derived as ξ^±(p-1)/3, ξ^±(p-1)/2 for the sextic twist factor ξ and
    VERIFIED against ψ = [p mod r] on the G2 generator (g2.go:527 psi;
    constants endo.u/endo.v in bls12-381.go:132)."""
    st = stack(curve_name)
    h = st.host_tf
    g = g2_group(curve_name)
    p = st.tf.p
    r = g.fr.modulus
    gen = (g._h(g.gx), g._h(g.gy))
    hc = g.host_curve
    want = hc.mul(p % r, gen)
    for ex in (1, -1):
        cx = h.pow(st.xi, ex * (p - 1) // 3 % (p * p - 1))
        cy = h.pow(st.xi, ex * (p - 1) // 2 % (p * p - 1))
        px = h.mul(h.conj(gen[0]), cx)
        py = h.mul(h.conj(gen[1]), cy)
        if want is not None and h.eq(px, want[0]) and h.eq(py, want[1]):
            return cx, cy
    raise AssertionError(f"{curve_name}: psi convention not found")


def psi(curve_name: str, pt: JacF) -> JacF:
    """ψ = untwist∘Frobenius∘twist on Jacobian twist coordinates."""
    st = stack(curve_name)
    F = st.tf
    cx, cy = _psi_consts(curve_name)
    batch = pt.x.shape[1:]
    return JacF(
        F.mul(F.frobenius(pt.x), F.const(cx, batch)),
        F.mul(F.frobenius(pt.y), F.const(cy, batch)),
        F.frobenius(pt.z),
    )


def jac_mul_int_g(g: Group, p: JacF, k: int) -> JacF:
    """[k]P over a generic Group for a host integer k (double-and-add under
    lax.scan over the static bit string, as curves/sswu.py jac_mul_int)."""
    if k == 0:
        return gp.jac_inf(g, p.x.shape[1:])
    if k < 0:
        return jac_mul_int_g(g, gp.jac_neg(g, p), -k)
    bits = bin(k)[2:]
    if len(bits) <= 16:
        acc = None
        for bit in bits:
            if acc is not None:
                acc = gp.jac_double(g, acc)
            if bit == "1":
                acc = p if acc is None else gp.jac_add(g, acc, p)
        return acc
    bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=np.bool_))

    def body(acc, bit):
        acc = gp.jac_double(g, acc)
        added = gp.jac_add(g, acc, p)
        return gp.jac_select(
            g, jnp.broadcast_to(bit, acc.x.shape[1:]), added, acc
        ), None

    acc, _ = jax.lax.scan(body, p, bit_arr)
    return acc


@functools.cache
def _third_root_fp(curve_name: str) -> int:
    """The cube root of unity used by ψ² (thirdRootOneG1): ψ²(x,y) =
    (ω·x, y) with ω = ξ^((p²-1)/3)... equivalently cx·frob(cx) projected to
    Fp.  Derived from the ψ constants (always lands in Fp)."""
    st = stack(curve_name)
    h = st.host_tf
    cx, _ = _psi_consts(curve_name)
    w = h.mul(cx, h.conj(cx))       # cx^(1+p) = cx * frob(cx), lies in Fp
    comps = h.coeffs(w)
    assert all(c == 0 for c in comps[1:]), "psi^2 x-coefficient not in Fp"
    return comps[0] % st.tf.p


def clear_cofactor_g2(curve_name: str, pt: JacF) -> JacF:
    """Family dispatch for G2 cofactor clearing."""
    st = stack(curve_name)
    if st.family == "bn":
        return _clear_cofactor_g2_bn(curve_name, pt)
    return _clear_cofactor_g2_bls12(curve_name, pt)


def _clear_cofactor_g2_bn(curve_name: str, pt: JacF) -> JacF:
    """BN G2 cofactor clearing (cacr2011-26 §6.1, ecc/bn254/g2.go:634):
    [x]Q + psi(3[x]Q) + psi^2([x]Q) + psi^3(Q)."""
    g = g2_group(curve_name)
    xq = jac_mul_int_g(g, pt, _seed(curve_name))
    p1 = psi(curve_name, gp.jac_add(g, gp.jac_double(g, xq), xq))
    p2 = psi(curve_name, psi(curve_name, xq))
    p3 = psi(curve_name, psi(curve_name, psi(curve_name, pt)))
    res = gp.jac_add(g, xq, p1)
    res = gp.jac_add(g, res, p2)
    return gp.jac_add(g, res, p3)


def _clear_cofactor_g2_bls12(curve_name: str, pt: JacF) -> JacF:
    """BLS12 G2 cofactor clearing, eprint 2017/419 §4.1 (g2.go:627):

        [x²-x-1]P + [x-1]ψ(P) + ψ²(2P)  realized as
        xxg - xg - P + ψ(xg - P) - φ(2P)

    with xg = [x]P (signed seed x), xxg = [x]xg, and φ the Fp cube-root
    twist of ψ² (X *= thirdRootOne)."""
    g = g2_group(curve_name)
    st = stack(curve_name)
    F = st.tf
    cs_seed = _seed(curve_name)
    xg = jac_mul_int_g(g, pt, cs_seed)
    xxg = jac_mul_int_g(g, xg, cs_seed)
    res = gp.jac_add(g, xxg, gp.jac_neg(g, xg))
    res = gp.jac_add(g, res, gp.jac_neg(g, pt))
    t = gp.jac_add(g, xg, gp.jac_neg(g, pt))
    t = psi(curve_name, t)
    res = gp.jac_add(g, res, t)
    t = gp.jac_double(g, pt)
    w = _third_root_fp(curve_name)
    batch = t.x.shape[1:]
    t = JacF(F.mul_fp(t.x, mont.const(F.spec, w, batch)), t.y, t.z)
    return gp.jac_add(g, res, gp.jac_neg(g, t))


@functools.cache
def _seed(curve_name: str) -> int:
    from . import spec as cspec

    cs: CurveSpec = getattr(cspec, curve_name)()
    return cs.seed


# ---------------------------------------------------------------------------
# hash / encode to G2
# ---------------------------------------------------------------------------


def hash_to_field_g2(curve_name: str, msg: bytes, dst: bytes, count: int):
    """RFC 9380 §5.2 with m = [F_tf : F_p]: returns a device (L, count)
    twist-field element array."""
    st = stack(curve_name)
    F = st.tf
    p = F.p
    m = F.host.degree_abs
    L = -(-(p.bit_length() + 128) // 8)
    uniform = expand_msg_xmd(msg, dst, count * m * L)
    els = []
    for j in range(count):
        coords = []
        for i in range(m):
            off = (j * m + i) * L
            coords.append(int.from_bytes(uniform[off:off + L], "big") % p)
        els.append(_coords_to_host(F.host, coords))
    return F.from_ints(els)


def _coords_to_host(h, coords):
    """Prime coordinate list -> nested host element for HostExt."""
    if len(coords) == 1:
        return coords[0]
    d = h.d
    sub = len(coords) // d
    if sub == 1:
        return tuple(coords)
    return tuple(_coords_to_host(h.base, coords[k * sub:(k + 1) * sub])
                 for k in range(d))


def _map_to_curve_g2(curve_name: str, u) -> AffineF:
    """Suite dispatch: SVDW (bn254) vs SSWU+isogeny (bls12/bw6)."""
    if curve_name in SVDW_G2:
        return map_to_curve_svdw_g2(curve_name, u)
    return map_to_curve_sswu_g2(curve_name, u)


def hash_to_g2(curve_name: str, msg: bytes, dst: bytes):
    """HashToG2 (hash_to_g2.go:365): hash_to_field(2) -> 2x map -> add ->
    clear cofactor.  Returns host (x, y) twist coordinates."""
    g = g2_group(curve_name)
    u = hash_to_field_g2(curve_name, msg, dst, 2)
    q0 = _map_to_curve_g2(curve_name, u[:, 0:1])
    q1 = _map_to_curve_g2(curve_name, u[:, 1:2])
    s = gp.jac_add(g, gp.jac_from_affine(g, q0), gp.jac_from_affine(g, q1))
    out = clear_cofactor_g2(curve_name, s)
    aff = gp.jac_to_affine(g, out)
    return gp.affine_to_host(g, aff).reshape(-1)[0]


def encode_to_g2(curve_name: str, msg: bytes, dst: bytes):
    """EncodeToG2 (hash_to_g2.go:342): one map, then clear cofactor."""
    g = g2_group(curve_name)
    u = hash_to_field_g2(curve_name, msg, dst, 1)
    q = _map_to_curve_g2(curve_name, u)
    out = clear_cofactor_g2(curve_name, gp.jac_from_affine(g, q))
    aff = gp.jac_to_affine(g, out)
    return gp.affine_to_host(g, aff).reshape(-1)[0]
