"""Curve specifications (short Weierstrass y^2 = x^3 + ax + b) — the analogue
of the reference's per-curve constants (ecc/bn254/bn254.go:70-90,
ecc/bls12-381/bls12-381.go:100-135).

Generator coordinates are the published standard values (matching the
reference's g1Gen.SetString literals); GLV lambda/beta are *derived* at first
use (cube roots of unity matched on the generator, curves/reference.py) rather
than hardcoded, and every constant is verified at construction.
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields.fields import get_spec
from ..fields.spec import FieldSpec
from .reference import RefCurve, derive_glv


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    fp: FieldSpec          # base field
    fr: FieldSpec          # scalar field (prime subgroup order)
    a: int
    b: int                 # curve coefficient
    gx: int
    gy: int
    cofactor: int
    seed: int = 0          # BN/BLS family parameter t (for pairing loop)
    has_glv: bool = True

    def __post_init__(self):
        p = self.fp.modulus
        assert (self.gy**2 - self.gx**3 - self.a * self.gx - self.b) % p == 0, (
            f"{self.name}: generator not on curve"
        )
        # generator must have order r
        assert self.ref.mul(self.fr.modulus, self.generator) is None, (
            f"{self.name}: generator order != r"
        )

    @functools.cached_property
    def ref(self) -> RefCurve:
        return RefCurve(self.fp.modulus, self.a, self.b, self.fr.modulus)

    @property
    def generator(self):
        return (self.gx, self.gy)

    @functools.cached_property
    def glv(self) -> tuple[int, int]:
        """(lambda mod r, beta mod p), verified on the generator."""
        assert self.has_glv, f"{self.name} has no GLV endomorphism"
        return derive_glv(self.fp.modulus, self.fr.modulus, self.ref, self.generator)


@functools.cache
def bn254() -> CurveSpec:
    return CurveSpec(
        name="bn254",
        fp=get_spec("bn254_fp"),
        fr=get_spec("bn254_fr"),
        a=0,
        b=3,
        gx=1,
        gy=2,
        cofactor=1,
        seed=4965661367192848881,
    )


@functools.cache
def bls12_381() -> CurveSpec:
    # g1Gen per ecc/bls12-381/bls12-381.go:106-107 (standard RFC generator)
    return CurveSpec(
        name="bls12_381",
        fp=get_spec("bls12_381_fp"),
        fr=get_spec("bls12_381_fr"),
        a=0,
        b=4,
        gx=3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
        gy=1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
        cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
        seed=-0xD201000000010000,
    )


@functools.cache
def bls12_377() -> CurveSpec:
    # g1Gen per ecc/bls12-377/bls12-377.go:107-108
    return CurveSpec(
        name="bls12_377",
        fp=get_spec("bls12_377_fp"),
        fr=get_spec("bls12_377_fr"),
        a=0,
        b=1,
        gx=81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
        gy=241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
        cofactor=0x170B5D4430000000000000000000000000000000,
        seed=9586122913090633729,
    )


@functools.cache
def bls24_315() -> CurveSpec:
    # g1Gen per ecc/bls24-315/bls24-315.go:101-103; cofactor (x-1)^2/3
    x = -3218079743
    return CurveSpec(
        name="bls24_315",
        fp=get_spec("bls24_315_fp"),
        fr=get_spec("bls24_315_fr"),
        a=0,
        b=1,
        gx=34223510504517033132712852754388476272837911830964394866541204856091481856889569724484362330263,
        gy=24215295174889464585413596429561903295150472552154479431771837786124301185073987899223459122783,
        cofactor=(x - 1) ** 2 // 3,
        seed=x,
    )


@functools.cache
def bls24_317() -> CurveSpec:
    # g1Gen per ecc/bls24-317/bls24-317.go:98-100
    x = 3640754176
    return CurveSpec(
        name="bls24_317",
        fp=get_spec("bls24_317_fp"),
        fr=get_spec("bls24_317_fr"),
        a=0,
        b=4,
        gx=26261810162995192444253184251590159762050205376519976412461726336843100448942248976252388876791,
        gy=26146603602820658047261036676090398397874822703333117264049387703172159980214065566219085800243,
        cofactor=(x - 1) ** 2 // 3,
        seed=x,
    )


@functools.cache
def bw6_761() -> CurveSpec:
    # g1Gen per ecc/bw6-761/bw6-761.go:97-99; E: y^2 = x^3 - 1; cofactor
    # derived by Hasse-window search (curves/reference.py derive_cofactor)
    from .reference import RefCurve, derive_cofactor

    fp = get_spec("bw6_761_fp")
    fr = get_spec("bw6_761_fr")
    h = derive_cofactor(fp.modulus, fr.modulus, RefCurve(fp.modulus, 0, -1))
    return CurveSpec(
        name="bw6_761",
        fp=fp,
        fr=fr,
        a=0,
        b=-1,
        gx=6238772257594679368032145693622812838779005809760824733138787810501188623461307351759238099287535516224314149266511977132140828635950940021790489507611754366317801811090811367945064510304504157188661901055903167026722666149426237,
        gy=2101735126520897423911504562215834951148127555913367997162789335052900271653517958562461315794228241561913734371411178226936527683203879553093934185950470971848972085321797958124416462268292467002957525517188485984766314758624099,
        cofactor=h,
        seed=9586122913090633729,
    )


@functools.cache
def bw6_633() -> CurveSpec:
    # g1Gen per ecc/bw6-633/bw6-633.go:87-89; E: y^2 = x^3 + 4
    from .reference import RefCurve, derive_cofactor

    fp = get_spec("bw6_633_fp")
    fr = get_spec("bw6_633_fr")
    h = derive_cofactor(fp.modulus, fr.modulus, RefCurve(fp.modulus, 0, 4))
    return CurveSpec(
        name="bw6_633",
        fp=fp,
        fr=fr,
        a=0,
        b=4,
        gx=14087405796052437206213362229855313116771222912153372774869400386285407949123477431442535997951698710614498307938219633856996133201713506830167161540335446217605918678317160130862890417553415,
        gy=5208886161111258314476333487866604447704068601830026647530443033297117148121067806438008469463787158470000157308702133756065259580313172904438248825389121766442385979570644351664733475122746,
        cofactor=h,
        seed=-3218079743,
    )


@functools.cache
def secp256k1() -> CurveSpec:
    # standard SEC2 generator (ecc/secp256k1/secp256k1.go:59-60)
    return CurveSpec(
        name="secp256k1",
        fp=get_spec("secp256k1_fp"),
        fr=get_spec("secp256k1_fr"),
        a=0,
        b=7,
        gx=55066263022277343669578718895168534326250603453777594175500187360389116729240,
        gy=32670510020758816978083085130507043184471273380659243275938904335757337482424,
        cofactor=1,
    )


@functools.cache
def stark_curve() -> CurveSpec:
    # StarkWare curve: y^2 = x^3 + x + b (a = 1), no GLV
    return CurveSpec(
        name="stark_curve",
        fp=get_spec("stark_fp"),
        fr=get_spec("stark_fr"),
        a=1,
        b=3141592653589793238462643383279502884197169399375105820974944592307816406665,
        gx=874739451078007766457464989774322083649278607533249481151382481072868806602,
        gy=152666792071518830868575557812948353041420400780739481342941381225525861407,
        cofactor=1,
        has_glv=False,
    )
