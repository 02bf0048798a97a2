"""Per-curve tower stacks for ALL pairing families, on the generic flat Ops.

The tower shapes and nonresidues mirror the reference curve doc headers:
  bn254      : Fp2(u²=-1)  -> Fp6(v³=9+u)   -> Fp12(w²=v)   D-twist, b'=3/(9+u)
  bls12-381  : Fp2(u²=-1)  -> Fp6(v³=1+u)   -> Fp12(w²=v)   M-twist, b'=4(1+u)
  bls12-377  : Fp2(u²=-5)  -> Fp6(v³=u)     -> Fp12(w²=v)   D-twist, b'=1/u
  bls24-315  : Fp2(u²=13)  -> Fp4(v²=u) -> Fp12(w³=v) -> Fp24(i²=w)
               D-twist over Fp4, b' = 1/v          (ecc/bls24-315/bls24-315.go)
  bls24-317  : Fp2(u²=-1)  -> Fp4(v²=1+u) -> Fp12(w³=v) -> Fp24(i²=w)
               M-twist over Fp4, b' = 4v           (ecc/bls24-317/bls24-317.go)
  bw6-761    : Fp3(u³=-4)  -> Fp6(v²=u)    M-twist over Fp,  b' = 4
  bw6-633    : Fp3(u³=2)   -> Fp6(v²=u)    M-twist over Fp,  b' = 8

Each stack exposes:
  fp    : PrimeOps for the base field
  tf    : Ops of the TWIST field (G2 coordinate field: Fp2 / Fp4 / Fp)
  full  : Ops of the full extension (pairing target field)
  xi    : host tf element, the sextic nonresidue (full = tf[w]/(w^6 - xi))
  twist : 'D' or 'M'
  b_twist : host tf element, the twist curve b coefficient
  g2_gen  : host (x, y) twist-field coordinates of the G2 generator
  seed, family, loop_const : Miller loop parameters

The full field is ALWAYS constructed as Quad(Cubic(tf, xi)) so the sextic
w-coefficient view used by line evaluations is uniform across families
(w-power k lives at flat component (k%2)*3 + k//2 — same layout as the
reference's E12-over-E2 coefficient order, fptower/e12.go MulBy034).
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields.fields import get_spec
from .ext import ExtOps, PrimeOps


@dataclasses.dataclass(frozen=True)
class PairingStack:
    name: str
    fp: PrimeOps
    tf: object            # twist-field Ops (coordinates of G2)
    full: object          # Quad(Cubic(tf, xi)): the pairing target field
    xi: object            # host tf element: sextic nonresidue
    twist: str            # 'D' or 'M'
    b: int                # E/Fp: y^2 = x^3 + b
    b_twist: object       # host tf element
    g2_gen: tuple         # ((x), (y)) host tf elements
    seed: int
    family: str           # 'bn' | 'bls12' | 'bls24' | 'bw6'
    r: int                # subgroup order

    @property
    def p(self) -> int:
        return self.fp.p

    @functools.cached_property
    def loop_const(self) -> int:
        """Miller loop length m for f_{m,Q}(P).

        bn: 6x+2; bls12/bls24: x (optimal ate); bw6: plain ate T = t-1 = p mod r
        (T = p mod r always satisfies the ate condition T = p mod r; the
        optimal 2-loop form of ecc/bw6-761/pairing.go:130 is a later
        optimization)."""
        if self.family == "bn":
            return 6 * self.seed + 2
        if self.family in ("bls12", "bls24"):
            return self.seed
        return self.p % self.r

    @functools.cached_property
    def final_exp_hard(self) -> int:
        """Phi_k(p)/r — the cyclotomic hard part exponent."""
        p, r = self.p, self.r
        k = self.embedding_degree
        if k == 12:
            phi = p**4 - p**2 + 1
        elif k == 24:
            phi = p**8 - p**4 + 1
        elif k == 6:
            phi = p**2 - p + 1
        else:
            raise ValueError(k)
        assert phi % r == 0
        return phi // r

    @property
    def embedding_degree(self) -> int:
        return 6 * self.tf.host.degree_abs

    @functools.cached_property
    def host_full(self):
        return self.full.host

    @functools.cached_property
    def host_tf(self):
        return self.tf.host


def _sextic(tf, xi, name):
    """full = tf[w]/(w^6 - xi) as Quad(Cubic(tf, xi)): v = w^2, then w^2 = v."""
    cubic = ExtOps(tf, 3, xi, name + "_cubic")
    return ExtOps(cubic, 2, cubic.host.gen(), name + "_full")


@functools.cache
def bn254_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bn254_fp"))
    e2 = ExtOps(fp, 2, -1, "bn254_e2")
    xi = (9, 1)
    h2 = e2.host
    b_twist = h2.mul(h2.embed(3), h2.inv(xi))  # D-twist: b/xi
    from .reference import bn254_tower

    ts = bn254_tower()
    return PairingStack(
        name="bn254", fp=fp, tf=e2, full=_sextic(e2, xi, "bn254"),
        xi=xi, twist="D", b=3, b_twist=b_twist,
        g2_gen=(ts.g2x, ts.g2y), seed=ts.seed, family="bn", r=ts.r,
    )


@functools.cache
def bls12_381_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bls12_381_fp"))
    e2 = ExtOps(fp, 2, -1, "bls12_381_e2")
    xi = (1, 1)
    h2 = e2.host
    b_twist = h2.mul(h2.embed(4), xi)  # M-twist: b*xi
    from .reference import bls12_381_tower

    ts = bls12_381_tower()
    return PairingStack(
        name="bls12_381", fp=fp, tf=e2, full=_sextic(e2, xi, "bls12_381"),
        xi=xi, twist="M", b=4, b_twist=b_twist,
        g2_gen=(ts.g2x, ts.g2y), seed=ts.seed, family="bls12", r=ts.r,
    )


@functools.cache
def bls12_377_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bls12_377_fp"))
    e2 = ExtOps(fp, 2, -5, "bls12_377_e2")
    xi = (0, 1)
    h2 = e2.host
    b_twist = h2.mul(h2.embed(1), h2.inv(xi))  # D-twist: b/xi = 1/u
    from .reference import bls12_377_tower

    ts = bls12_377_tower()
    return PairingStack(
        name="bls12_377", fp=fp, tf=e2, full=_sextic(e2, xi, "bls12_377"),
        xi=xi, twist="D", b=1, b_twist=b_twist,
        g2_gen=(ts.g2x, ts.g2y), seed=ts.seed, family="bls12", r=ts.r,
    )


# ---- BLS24 ------------------------------------------------------------------

# G2 generator coordinates (host E4 = ((e2), (e2)) tuples), from
# ecc/bls24-315/bls24-315.go:108-117.  gnark's E4.B0/B1 are E2 = A0 + A1*u;
# E4 = B0 + B1*v.
_BLS24_315_G2X = (
    (24614737899199071964341749845083777103809664018538138889239909664991294445469052467064654073699,
     17049297748993841127032249156255993089778266476087413538366212660716380683149731996715975282972),
    (11950668649125904104557740112865942804623051114821811669564995102755430514441092495782202668342,
     3603055379462539802413979855826194299714805833759849528529386570240639115620788686893505938793),
)
_BLS24_315_G2Y = (
    (31740092748246070457677943092194030978994615503726570180895475408200863271773078192139722193079,
     30261413948955264769241509843031153941332801192447678605718183215275065425758214858190865971597),
    (14195825602561496219090410113749222574308144851497375443809100117082380611212823440674391088885,
     2391152940984805871402135750194189812615420966694899795235607856168224901793030297133493038211),
)

BLS24_315_SEED = -3218079743
BLS24_317_SEED = 3640754176


def _bls_r_from_seed(x: int) -> int:
    return x**8 - x**4 + 1


@functools.cache
def bls24_315_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bls24_315_fp"))
    e2 = ExtOps(fp, 2, 13, "bls24_315_e2")
    e4 = ExtOps(e2, 2, e2.host.gen(), "bls24_315_e4")  # v^2 = u
    h4 = e4.host
    xi = h4.gen()                                      # w^3 = v -> xi = v
    b_twist = h4.inv(xi)                               # D-twist: b'=1/v (b=1)
    r = get_spec("bls24_315_fr").modulus
    assert r == _bls_r_from_seed(BLS24_315_SEED)
    return PairingStack(
        name="bls24_315", fp=fp, tf=e4, full=_sextic(e4, xi, "bls24_315"),
        xi=xi, twist="D", b=1, b_twist=b_twist,
        g2_gen=(_BLS24_315_G2X, _BLS24_315_G2Y),
        seed=BLS24_315_SEED, family="bls24", r=r,
    )


# ecc/bls24-317/bls24-317.go:103-114 (B0/B1 are E2 = A0 + A1*u pairs)
_BLS24_317_G2X = (
    (28498404142312365002533744693556861244212064443103687717510540998257508853975496760832205123607,
     104881342316154169720140745551267577558255475983798552134082689646705436288255501236462500135051),
    (134208762611471838850128095341317427866582025424914361408168906642550705688378271974920859507485,
     47807860684290705153036437491997319116342330273104493957877398921782737166446662055996604784294),
)
_BLS24_317_G2Y = (
    (91516448788529060702418635560646746547369142933278847722177434542449427480796649633689953798948,
     13448671391015186163413673966297442264556781166352891049005282051703895543542296449974630011689),
    (1980905665816458576882252418967038151483710575831277397652951146268622037800272983431026055487,
     134363379072057086809745572347104070037544575425956896869689256737197090432635401300100624083192),
)


@functools.cache
def bls24_317_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bls24_317_fp"))
    e2 = ExtOps(fp, 2, -1, "bls24_317_e2")
    e4 = ExtOps(e2, 2, (1, 1), "bls24_317_e4")         # v^2 = 1 + u
    h4 = e4.host
    xi = h4.gen()                                      # w^3 = v
    b_twist = h4.mul(h4.embed(4), xi)                  # M-twist: b' = 4v
    r = get_spec("bls24_317_fr").modulus
    assert r == _bls_r_from_seed(BLS24_317_SEED)
    return PairingStack(
        name="bls24_317", fp=fp, tf=e4, full=_sextic(e4, xi, "bls24_317"),
        xi=xi, twist="M", b=4, b_twist=b_twist,
        g2_gen=(_BLS24_317_G2X, _BLS24_317_G2Y),
        seed=BLS24_317_SEED, family="bls24", r=r,
    )


@functools.cache
def bw6_761_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bw6_761_fp"))
    r = get_spec("bw6_761_fr").modulus
    g2x = 6445332910596979336035888152774071626898886139774101364933948236926875073754470830732273879639675437155036544153105017729592600560631678554299562762294743927912429096636156401171909259073181112518725201388196280039960074422214428
    g2y = 562923658089539719386922163444547387757586534741080263946953401595155211934630598999300396317104182598044793758153214972605680357108252243146746187917218885078195819486220416605630144001533548163105316661692978285266378674355041
    return PairingStack(
        name="bw6_761", fp=fp, tf=fp, full=_sextic(fp, -4, "bw6_761"),
        xi=-4, twist="M", b=-1, b_twist=4,
        g2_gen=(g2x, g2y), seed=9586122913090633729, family="bw6", r=r,
    )


@functools.cache
def bw6_633_stack() -> PairingStack:
    fp = PrimeOps(get_spec("bw6_633_fp"))
    r = get_spec("bw6_633_fr").modulus
    g2x = 13658793733252505713431834233072715040674666715141692574468286839081203251180283741830175712695426047062165811313478642863696265647598838732554425602399576125615559121457137320131899043374497
    g2y = 599560264833409786573595720823495699033661029721475252751314180543773745554433461106678360045466656230822473390866244089461950086268801746497554519984580043036179195728559548424763890207250
    return PairingStack(
        name="bw6_633", fp=fp, tf=fp, full=_sextic(fp, 2, "bw6_633"),
        xi=2, twist="M", b=4, b_twist=8,
        g2_gen=(g2x, g2y), seed=-3218079743, family="bw6", r=r,
    )


@functools.cache
def stack(curve_name: str) -> PairingStack:
    return {
        "bn254": bn254_stack,
        "bls12_381": bls12_381_stack,
        "bls12_377": bls12_377_stack,
        "bls24_315": bls24_315_stack,
        "bls24_317": bls24_317_stack,
        "bw6_761": bw6_761_stack,
        "bw6_633": bw6_633_stack,
    }[curve_name]()
