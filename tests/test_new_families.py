"""Tests for the generic tower stack, BLS24/BW6 families, G2 groups, generic
pairing, GLV lattice utilities and Eisenstein integers.

Strategy mirrors SURVEY.md §4: device kernels vs independent host big-int
oracles (towers/host.py is the oracle), plus self-verifying constant
derivations (cofactor Hasse search, GLV derivation, BLS parametrization).
"""

import numpy as np
import pytest

import jax

from gnark_crypto_tpu.curves import group as G
from gnark_crypto_tpu.curves import spec as cspec
from gnark_crypto_tpu.curves.g2 import g2_group
from gnark_crypto_tpu.curves.group import g1_group
from gnark_crypto_tpu.fields import mont
from gnark_crypto_tpu.fields.fields import get_spec
from gnark_crypto_tpu.msm import generic as gmsm
from gnark_crypto_tpu.pairing import ate
from gnark_crypto_tpu.pairing.host_oracle import GenericAteOracle
from gnark_crypto_tpu.towers.ext import ExtOps, PrimeOps, batch_inverse, pow_host
from gnark_crypto_tpu.towers.stacks import stack
from gnark_crypto_tpu.utils import eisenstein as eis
from gnark_crypto_tpu.utils import glv

ALL_PAIRING = [
    "bn254", "bls12_381", "bls12_377",
    "bls24_315", "bls24_317", "bw6_761", "bw6_633",
]
NEW_CURVES = ["bls24_315", "bls24_317", "bw6_761", "bw6_633"]


# ---------------------------------------------------------------------------
# host-side (fast): constants, stacks, lattice math
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ALL_PAIRING)
def test_stack_constants(name):
    """G2 generator on twist curve with order r; frobenius == pow(p^i)."""
    st = stack(name)
    h = st.host_tf
    from gnark_crypto_tpu.towers.host import HostCurve

    b = st.b_twist if not isinstance(st.b_twist, int) else h.embed(st.b_twist)
    curve = HostCurve(h, b)
    G2 = st.g2_gen
    if isinstance(G2[0], int):
        G2 = (h.embed(G2[0]), h.embed(G2[1]))
    assert curve.is_on_curve(G2)
    assert curve.mul(st.r, G2) is None
    hf = st.host_full
    rng = np.random.default_rng(3)
    x = hf.rand(rng)
    assert hf.eq(hf.frobenius(x, 1), hf.pow(x, st.p))
    assert hf.eq(hf.frobenius(x, 2), hf.pow(x, st.p**2))


@pytest.mark.parametrize("name", NEW_CURVES)
def test_new_g1_specs(name):
    """Generator/cofactor/GLV constants all self-verify at construction."""
    cs = getattr(cspec, name)()
    lam, beta = cs.glv  # raises if derivation fails
    ref = cs.ref
    Gp = cs.generator
    assert ref.mul(lam, Gp) == (Gp[0] * beta % cs.fp.modulus, Gp[1])
    # cofactor: [h*r] kills a random non-subgroup point
    from gnark_crypto_tpu.curves.reference import find_point

    P = find_point(ref, seed=5)
    assert ref.mul(cs.cofactor * cs.fr.modulus, P) is None


def test_glv_lattice_split():
    cs = cspec.bn254()
    lam, _ = cs.glv
    lat = glv.precompute_lattice(cs.fr.modulus, lam)
    rng = np.random.default_rng(0)
    for _ in range(10):
        s = int(rng.integers(1, 2**62)) ** 4 % cs.fr.modulus
        u, v = glv.split_scalar(s, lat)
        assert (u + v * lam - s) % cs.fr.modulus == 0
        assert max(abs(u), abs(v)).bit_length() <= cs.fr.bits // 2 + 2


def test_naf():
    rng = np.random.default_rng(1)
    for _ in range(20):
        x = int(rng.integers(0, 2**63))
        d = glv.naf_decomposition(x)
        assert glv.naf_value(d) == x
        # non-adjacency
        assert all(not (a != 0 and b != 0) for a, b in zip(d, d[1:]))


def test_eisenstein():
    rng = np.random.default_rng(2)
    for _ in range(20):
        a = (int(rng.integers(-(2**40), 2**40)), int(rng.integers(-(2**40), 2**40)))
        b = (int(rng.integers(-(2**20), 2**20)), int(rng.integers(-(2**20), 2**20)))
        if eis.norm(b) == 0:
            continue
        q, r = eis.quo_rem(a, b)
        assert eis.add(eis.mul(b, q), r) == a
        assert eis.norm(r) < eis.norm(b)
        w, v, u = eis.half_gcd(a, b)
        assert w == eis.add(eis.mul(a, u), eis.mul(b, v))


def test_registry_new_curves():
    from gnark_crypto_tpu import registry

    assert len(registry.implemented()) == 9
    for id_ in (registry.ID.BLS24_315, registry.ID.BW6_761):
        assert registry.scalar_field(id_) > 1
        st = registry.pairing_stack(id_)
        assert st.embedding_degree in (6, 24)
    assert "MIMC_BLS24_315_FR" in registry._HASHES
    h = registry.new_hash("MIMC_BW6_633_FR")
    assert h.rounds == 136


# ---------------------------------------------------------------------------
# device: generic extension ops vs host oracle
# ---------------------------------------------------------------------------


def _check_ops(ops, n=3, seed=0, frob_powers=(1,)):
    h = ops.host
    rng = np.random.default_rng(seed)
    a_h = [h.rand(rng) for _ in range(n)]
    b_h = [h.rand(rng) for _ in range(n)]
    a, b = ops.from_ints(a_h), ops.from_ints(b_h)

    @jax.jit
    def f(a, b):
        return (
            ops.mul(a, b),
            ops.square(a),
            ops.inverse(a),
            batch_inverse(ops, a, axis=1),
            ops.add(a, b),
            ops.sub(a, b),
            pow_host(ops, a, 0xABCDEF0123),
        )

    m, sq, inv, binv, ad, su, pw = f(a, b)
    for i in range(n):
        assert h.eq(ops.to_ints(m)[i], h.mul(a_h[i], b_h[i]))
        assert h.eq(ops.to_ints(sq)[i], h.square(a_h[i]))
        assert h.eq(ops.to_ints(inv)[i], h.inv(a_h[i]))
        assert h.eq(ops.to_ints(binv)[i], h.inv(a_h[i]))
        assert h.eq(ops.to_ints(ad)[i], h.add(a_h[i], b_h[i]))
        assert h.eq(ops.to_ints(su)[i], h.sub(a_h[i], b_h[i]))
        assert h.eq(ops.to_ints(pw)[i], h.pow(a_h[i], 0xABCDEF0123))
    for p_i in frob_powers:
        fr = ops.to_ints(jax.jit(lambda x: ops.frobenius(x, p_i))(a))
        for i in range(n):
            assert h.eq(fr[i], h.pow(a_h[i], ops.p**p_i))


def test_ext_ops_e4_bls24_315():
    st = stack("bls24_315")
    _check_ops(st.tf, frob_powers=(1, 2, 3))


def test_ext_ops_e4_bls24_317():
    """p = 2 mod 3 upstream of the cubic level exercises the permuting
    Frobenius path."""
    st = stack("bls24_317")
    _check_ops(st.tf, frob_powers=(1, 3))


def test_ext_ops_e6_bw6_633():
    st = stack("bw6_633")
    _check_ops(st.full, n=2, frob_powers=(1, 3))


# ---------------------------------------------------------------------------
# device: G2 group law + MSM (bn254: cheapest compile)
# ---------------------------------------------------------------------------


def test_g2_scalar_mul_bn254():
    g = g2_group("bn254")
    hc = g.host_curve
    gen = (g._h(g.gx), g._h(g.gy))
    ks = [3, 7, 2**61 + 5, g.fr.modulus - 1]
    base = g.generator((len(ks),))
    sc = mont.from_ints(g.fr, ks, mont=False)
    jac = jax.jit(lambda b, s: G.scalar_mul(g, b, s))(base, sc)
    got = G.affine_to_host(g, G.jac_to_affine(g, jac))
    for i, k in enumerate(ks):
        want = hc.mul(k, gen)
        assert g.ops.host.eq(got[i][0], want[0])
        assert g.ops.host.eq(got[i][1], want[1])


def test_g2_msm_bn254():
    g = g2_group("bn254")
    hc = g.host_curve
    gen = (g._h(g.gx), g._h(g.gy))
    pts_h = [hc.mul(k, gen) for k in (1, 2, 3, 4, 5, 6)]
    scalars = [0, g.fr.modulus - 1, 7, 9, 11, 13]
    res = gmsm.msm(
        g, G.affine_from_host(g, pts_h),
        mont.from_ints(g.fr, scalars, mont=False), c=4,
    )
    res_h = G.affine_to_host(
        g, G.jac_to_affine(g, jax.tree.map(lambda a: a[..., None], res))
    )[0]
    want = None
    for k, P in zip(scalars, pts_h):
        want = hc.add(want, hc.mul(k, P))
    assert g.ops.host.eq(res_h[0], want[0])
    assert g.ops.host.eq(res_h[1], want[1])


def test_g2_subgroup_and_on_curve():
    g = g2_group("bls12_381")
    gen = g.generator((2,))
    assert bool(np.all(np.asarray(jax.jit(
        lambda a: G.is_on_curve_affine(g, a))(gen))))


# ---------------------------------------------------------------------------
# device: generic pairing (one new family in the default suite)
# ---------------------------------------------------------------------------


def test_generic_pairing_bls24_315():
    """Device generic ate pairing == host oracle, and bilinear."""
    name = "bls24_315"
    st = stack(name)
    orc = GenericAteOracle(st)
    g1, g2 = g1_group(name), g2_group(name)
    h1, h2 = g1.host_curve, g2.host_curve
    G1h = (g1._h(g1.gx), g1._h(g1.gy))
    G2h = (g2._h(g2.gx), g2._h(g2.gy))
    a, b = 31337, 271828
    Pa, Qb = h1.mul(a, G1h), h2.mul(b, G2h)
    e0 = orc.pair(G1h, G2h)
    K = st.host_full
    assert not K.eq(e0, K.one())
    p_dev = G.affine_from_host(g1, [Pa, G1h])
    q_dev = G.affine_from_host(g2, [Qb, G2h])
    got = st.full.to_ints(jax.jit(lambda p, q: ate.pair(st, p, q))(p_dev, q_dev))
    assert K.eq(got[1], e0)
    assert K.eq(got[0], K.pow(e0, a * b % st.r))


@pytest.mark.slow
def test_generic_mul_line_matches_full():
    """Generic-stack sparse line mul (ate.mul_line) == full mul, both twists."""
    import jax
    import numpy as np

    from gnark_crypto_tpu.pairing import ate
    from gnark_crypto_tpu.towers.stacks import stack

    for name in ("bls12_377", "bls12_381"):   # D-twist and M-twist
        st = stack(name)
        K, tf = st.full, st.tf
        rng = np.random.default_rng(13)
        f_host = st.host_full.rand(rng)
        f = K.from_ints([f_host])
        slots = (0, 1, 3) if st.twist == "D" else (0, 3, 5)
        entries = {k: tf.from_ints([st.host_tf.rand(rng)]) for k in slots}
        line = ate.sparse_line(st, entries, (1,))
        got = jax.jit(lambda a, b: ate.mul_line(st, a, b))(f, line)
        want = jax.jit(lambda a, b: K.mul(a, b))(f, line)
        assert (np.asarray(got) == np.asarray(want)).all(), name
