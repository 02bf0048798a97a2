"""Twisted Edwards companion curves (a x^2 + y^2 = 1 + d x^2 y^2 over the
SNARK curve's fr) — analogue of ecc/<curve>/twistededwards/{curve,point}.go.

Device ops use unified projective formulas (add-2008-bbjlp), complete when a
is a square and d a non-square (checked at construction), so one batched op
covers add/double/identity — no branches.  A host int oracle (`EdOracle`)
mirrors every op for tests and scalar protocol glue (EdDSA)."""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.fields import get_spec
from ..fields.reference import PF
from ..fields.spec import LIMB_BITS, FieldSpec
import numpy as np


@dataclasses.dataclass(frozen=True)
class EdwardsSpec:
    name: str
    fr: FieldSpec          # coordinate field
    a: int
    d: int
    order: int             # order of the prime subgroup
    cofactor: int
    bx: int
    by: int

    def __post_init__(self):
        pf = PF(self.fr.modulus)
        assert pf.legendre(self.d) == -1, "d must be a non-square"
        o = EdOracle(self)
        assert o.is_on_curve((self.bx, self.by)), "base point not on curve"
        assert o.mul(self.order, (self.bx, self.by)) == (0, 1), "base point order"

    @functools.cached_property
    def complete(self) -> bool:
        """Unified bbjlp addition is complete iff a is a square and d is not.
        Bandersnatch (a=-5, non-square) is the one incomplete instance; its
        exceptional pairs never arise for prime-subgroup points (same stance
        as the reference's shared projective formulas, twistededwards/point.go)."""
        return PF(self.fr.modulus).legendre(self.a) == 1


class EdOracle:
    """Host affine oracle; identity = (0, 1)."""

    def __init__(self, es: EdwardsSpec):
        self.es = es
        self.pf = PF(es.fr.modulus)

    def is_on_curve(self, P):
        x, y = P
        p = self.pf
        lhs = p.add(p.mul(self.es.a, p.mul(x, x)), p.mul(y, y))
        rhs = p.add(1, p.mul(self.es.d, p.mul(p.mul(x, x), p.mul(y, y))))
        return lhs == rhs

    def add(self, P, Q):
        p = self.pf
        x1, y1 = P
        x2, y2 = Q
        dxy = p.mul(self.es.d, p.mul(p.mul(x1, x2), p.mul(y1, y2)))
        x3 = p.div(p.add(p.mul(x1, y2), p.mul(y1, x2)), p.add(1, dxy))
        y3 = p.div(p.sub(p.mul(y1, y2), p.mul(self.es.a, p.mul(x1, x2))),
                   p.sub(1, dxy))
        return (x3, y3)

    def neg(self, P):
        return (self.pf.neg(P[0]), P[1])

    def mul(self, k, P):
        if k < 0:
            return self.mul(-k, self.neg(P))
        R, A = (0, 1), P
        while k:
            if k & 1:
                R = self.add(R, A)
            A = self.add(A, A)
            k >>= 1
        return R


class EdProj(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


class EdAffine(NamedTuple):
    x: jax.Array
    y: jax.Array


def ed_from_ints(es: EdwardsSpec, pts) -> EdAffine:
    f = es.fr
    return EdAffine(
        mont.from_ints(f, [P[0] for P in pts]),
        mont.from_ints(f, [P[1] for P in pts]),
    )


def ed_to_ints(es: EdwardsSpec, a: EdAffine):
    f = es.fr
    xs, ys = mont.to_ints(f, a.x), mont.to_ints(f, a.y)
    out = np.empty(xs.shape, dtype=object)
    it = np.nditer(xs, flags=["multi_index", "refs_ok"])
    for _ in it:
        i = it.multi_index
        out[i] = (int(xs[i]), int(ys[i]))
    return out


def ed_identity(es: EdwardsSpec, batch=()) -> EdProj:
    f = es.fr
    return EdProj(mont.zeros(f, batch), mont.one(f, batch), mont.one(f, batch))


def ed_from_affine(es: EdwardsSpec, a: EdAffine) -> EdProj:
    return EdProj(a.x, a.y, mont.one(es.fr, a.x.shape[1:]))


def ed_to_affine(es: EdwardsSpec, p: EdProj) -> EdAffine:
    f = es.fr
    zflat = p.z.reshape(f.n_limbs, -1)
    zinv = mont.batch_inverse(f, zflat, axis=1).reshape(p.z.shape)
    return EdAffine(mont.mul(f, p.x, zinv), mont.mul(f, p.y, zinv))


def ed_add(es: EdwardsSpec, p: EdProj, q: EdProj) -> EdProj:
    """Unified projective addition (add-2008-bbjlp) — complete."""
    f = es.fr
    A = mont.mul(f, p.z, q.z)
    B = mont.square(f, A)
    C = mont.mul(f, p.x, q.x)
    D = mont.mul(f, p.y, q.y)
    E = mont.mul_const(f, mont.mul(f, C, D), es.d)
    F = mont.sub(f, B, E)
    G = mont.add(f, B, E)
    xsum = mont.mul(f, mont.add(f, p.x, p.y), mont.add(f, q.x, q.y))
    x3 = mont.mul(f, mont.mul(f, A, F), mont.sub(f, mont.sub(f, xsum, C), D))
    y3 = mont.mul(f, mont.mul(f, A, G), mont.sub(f, D, mont.mul_const(f, C, es.a)))
    z3 = mont.mul(f, F, G)
    return EdProj(x3, y3, z3)


def ed_scalar_mul(es: EdwardsSpec, base: EdProj, scalars: jax.Array) -> EdProj:
    """Batched double-and-add; scalars: plain limb arrays over any modulus
    window (ScalarMultiplication, twistededwards/point.go:414)."""
    f = es.fr
    nbits = scalars.shape[0] * LIMB_BITS
    limb_idx = np.array([(nbits - 1 - i) // LIMB_BITS for i in range(nbits)], np.int32)
    shift = np.array([(nbits - 1 - i) % LIMB_BITS for i in range(nbits)], np.int32)
    acc0 = ed_identity(es, base.x.shape[1:])

    def body(acc, xs):
        li, sh = xs
        acc = ed_add(es, acc, acc)
        bit = (scalars[li] >> sh.astype(jnp.uint32)) & 1
        added = ed_add(es, acc, base)
        m = bit == 1
        acc = EdProj(
            mont.select(m, added.x, acc.x),
            mont.select(m, added.y, acc.y),
            mont.select(m, added.z, acc.z),
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(limb_idx), jnp.asarray(shift)))
    return acc


# ---------------------------------------------------------------------------
# named instances (internal/generator/config/*.go twisted-Edwards params)
# ---------------------------------------------------------------------------


@functools.cache
def bn254_edwards() -> EdwardsSpec:
    # config/bn254.go:60-69 (tBN254, "Baby-Jubjub"-style companion)
    return EdwardsSpec(
        name="bn254_edwards",
        fr=get_spec("bn254_fr"),
        a=-1 % get_spec("bn254_fr").modulus,
        d=12181644023421730124874158521699555681764249180949974110617291017600649128846,
        order=2736030358979909402780800718157159386076813972158567259200215660948447373041,
        cofactor=8,
        bx=9671717474070082183213120605117400219616337014328744928644933853176787189663,
        by=16950150798460657717958625567821834550301663161624707787222815936182638968203,
    )


@functools.cache
def bls12_381_edwards() -> EdwardsSpec:
    # config/bls12-381.go:136-146 ("Jubjub")
    fr = get_spec("bls12_381_fr")
    return EdwardsSpec(
        name="bls12_381_edwards",
        fr=fr,
        a=-1 % fr.modulus,
        d=19257038036680949359750312669786877991949435402254120286184196891950884077233,
        order=6554484396890773809930967563523245729705921265872317281365359162392183254199,
        cofactor=8,
        bx=23426137002068529236790192115758361610982344002369094106619281483467893291614,
        by=39325435222430376843701388596190331198052476467368316772266670064146548432123,
    )


@functools.cache
def bandersnatch() -> EdwardsSpec:
    # config/bls12-381.go:148-163 (a=-5, GLV endomorphism curve over fr381)
    fr = get_spec("bls12_381_fr")
    return EdwardsSpec(
        name="bandersnatch",
        fr=fr,
        a=-5 % fr.modulus,
        d=45022363124591815672509500913686876175488063829319466900776701791074614335719,
        order=13108968793781547619861935127046491459309155893440570251786403306729687672801,
        cofactor=4,
        bx=18886178867200960497001835917649091219057080094937609519140440539760939937304,
        by=19188667384257783945677642223292697773471335439753913231509108946878080696678,
    )


@functools.cache
def bls12_377_edwards() -> EdwardsSpec:
    # config/bls12-377.go:307-317
    fr = get_spec("bls12_377_fr")
    return EdwardsSpec(
        name="bls12_377_edwards",
        fr=fr,
        a=-1 % fr.modulus,
        d=3021,
        order=2111115437357092606062206234695386632838870926408408195193685246394721360383,
        cofactor=4,
        bx=717051916204163000937139483451426116831771857428389560441264442629694842243,
        by=882565546457454111605105352482086902132191855952243170543452705048019814192,
    )


@functools.cache
def bls24_315_edwards() -> EdwardsSpec:
    # config/bls24-315.go:59-69
    fr = get_spec("bls24_315_fr")
    return EdwardsSpec(
        name="bls24_315_edwards",
        fr=fr,
        a=-1 % fr.modulus,
        d=8771873785799030510227956919069912715983412030268481769609515223557738569779,
        order=1437753473921907580703509300571927811987591765799164617677716990775193563777,
        cofactor=8,
        bx=750878639751052675245442739791837325424717022593512121860796337974109802674,
        by=1210739767513185331118744674165833946943116652645479549122735386298364723201,
    )


@functools.cache
def bls24_317_edwards() -> EdwardsSpec:
    # config/bls24-317.go:71-81
    fr = get_spec("bls24_317_fr")
    return EdwardsSpec(
        name="bls24_317_edwards",
        fr=fr,
        a=-1 % fr.modulus,
        d=20748505950524021841644589704740731932416084248011369709738936344973878925081,
        order=3858698654557105525567273719690987823069521430163883173133245580997415449969,
        cofactor=8,
        bx=4348505656527095883506785370890963704100065639426869666063106978260788240233,
        by=1929349327278552762783636859845493911537170411830425720219700276810167091201,
    )


@functools.cache
def bw6_761_edwards() -> EdwardsSpec:
    # config/bw6-761.go:264-274
    fr = get_spec("bw6_761_fr")
    return EdwardsSpec(
        name="bw6_761_edwards",
        fr=fr,
        a=-1 % fr.modulus,
        d=79743,
        order=32333053251621136751331591711861691692049189094364332567435817881934511297123972799646723302813083835942624121493,
        cofactor=8,
        bx=109887223397525145051017418760180386187632078445902299543670312117371514695798874370143656894667315818446285582389,
        by=31146823455109675839494591101665406662142618451815824757336761504421066243585705807124836638254810186490790034654,
    )


@functools.cache
def bw6_633_edwards() -> EdwardsSpec:
    # config/bw6-633.go:112-122
    fr = get_spec("bw6_633_fr")
    return EdwardsSpec(
        name="bw6_633_edwards",
        fr=fr,
        a=-1 % fr.modulus,
        d=37248940285811842784899494310834635440994424264352085037441815381151934266434102922992043546621,
        order=4963142838689179791878211236301121218116687802119716497817028544854034649070444389864454748079,
        cofactor=8,
        bx=37635937024655419978837220647164498012335808680404874556501960268316961933409049243153117555100,
        by=23823085625708063001015413934245381846960101450148849601038571303382730455875805408244170280142,
    )


EDWARDS_CURVES = {
    "bn254": bn254_edwards,
    "bls12_381": bls12_381_edwards,
    "bandersnatch": bandersnatch,
    "bls12_377": bls12_377_edwards,
    "bls24_315": bls24_315_edwards,
    "bls24_317": bls24_317_edwards,
    "bw6_761": bw6_761_edwards,
    "bw6_633": bw6_633_edwards,
}
