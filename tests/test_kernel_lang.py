"""Kernel-language (fields/kernel_lang.py) op parity vs the mont oracle.

KF ops are pure trace-time functions over uint32 vector values — exactly the
code that runs inside the fused Pallas kernels (curves/pallas_point.py).
Here they are applied DIRECTLY to jnp arrays under plain jit (no Pallas
layer: interpret-mode compiles of these graphs take minutes on XLA:CPU) and
compared against fields/mont.py, which is itself oracle-tested against the
big-int reference.  One pallas-interpret round-trip lives in the slow tier
(test_pallas_interpret_mul) to pin the ref-plumbing; full fused point-kernel
parity is test_fused_point.py (slow) + the TPU MSM oracle runs."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.fields import get_spec, mont
from gnark_crypto_tpu.fields.kernel_lang import KF, kspec


def _run_kernel(spec, body, arrays):
    """Apply body(kf, loaded...) to (n16, N) arrays under jit."""
    n16 = spec.n_limbs

    @jax.jit
    def fn(*arrs):
        kf = KF(kspec(spec))
        loaded = [kf.load16([a[i, :] for i in range(n16)]) for a in arrs]
        out = body(kf, *loaded)
        return jnp.stack(kf.store16(out, n16), axis=0)

    return fn(*arrays)


# XLA:CPU compile time explodes superlinearly with kernel limb count (bn254's
# 20-limb graphs compile in ~1s; bls12-381's 30-limb ones take many minutes),
# so the fast tier pins bn254 + the narrow stark field; wide fields are slow.
_FAST_FIELDS = ["bn254_fp", "stark_fp"]
_SLOW_FIELDS = ["bls12_381_fp", "bw6_633_fp"]


@pytest.fixture(params=_FAST_FIELDS + [
    pytest.param(f, marks=pytest.mark.slow) for f in _SLOW_FIELDS
])
def field(request):
    spec = get_spec(request.param)
    rng = np.random.default_rng(42)
    n = 8
    vals_a = [int(x) % spec.modulus for x in rng.integers(0, 2**63, n)]
    vals_b = [int(x) % spec.modulus for x in rng.integers(0, 2**63, n)]
    # full-width values + edge cases
    vals_a[0] = 0
    vals_a[1] = spec.modulus - 1
    vals_b[1] = spec.modulus - 1
    vals_a[2] = int(rng.integers(0, 2**62)) * (spec.modulus // 2**62)
    a = mont.from_ints(spec, vals_a)
    b = mont.from_ints(spec, vals_b)
    return spec, a, b, vals_a, vals_b


def _check(spec, got, want_arr):
    got_i = mont.to_ints(spec, got)
    want_i = mont.to_ints(spec, want_arr)
    assert (got_i == want_i).all(), (got_i, want_i)


def test_load_store_roundtrip(field):
    spec, a, _, _, _ = field
    out = _run_kernel(spec, lambda kf, x: x, [a])
    assert (np.asarray(out) == np.asarray(a)).all()


def test_kf_mul(field):
    spec, a, b, _, _ = field
    out = _run_kernel(spec, lambda kf, x, y: kf.mul(x, y), [a, b])
    _check(spec, out, mont.mul(spec, a, b))


def test_kf_sqr(field):
    spec, a, _, _, _ = field
    out = _run_kernel(spec, lambda kf, x: kf.sqr(x), [a])
    _check(spec, out, mont.square(spec, a))


def test_kf_add_sub_double_neg(field):
    spec, a, b, _, _ = field
    out = _run_kernel(spec, lambda kf, x, y: kf.add(x, y), [a, b])
    _check(spec, out, mont.add(spec, a, b))
    out = _run_kernel(spec, lambda kf, x, y: kf.sub(x, y), [a, b])
    _check(spec, out, mont.sub(spec, a, b))
    out = _run_kernel(spec, lambda kf, x: kf.double(x), [a])
    _check(spec, out, mont.double(spec, a))
    out = _run_kernel(spec, lambda kf, x: kf.neg(x), [a])
    _check(spec, out, mont.neg(spec, a))


@pytest.mark.slow
def test_kf_lazy_domain_composition(field):
    """Chained ops exercise the < 2q lazy domain: (a+b)*(a-b) == a^2 - b^2.

    Slow tier: XLA:CPU compile time explodes on op CHAINS of these
    carry-save graphs (a single mul compiles in ~1s; mul-of-add/sub takes
    minutes).  TPU compiles the same graphs in seconds."""
    spec, a, b, _, _ = field
    out = _run_kernel(
        spec, lambda kf, x, y: kf.mul(kf.add(x, y), kf.sub(x, y)), [a, b]
    )
    want = mont.sub(spec, mont.square(spec, a), mont.square(spec, b))
    _check(spec, out, want)


def test_kf_select_is_zero(field):
    spec, a, b, _, _ = field

    def body(kf, x, y):
        z = kf.sub(x, x)            # 0 (possibly represented as q)
        return kf.select(kf.is_zero(z), x, y)

    out = _run_kernel(spec, body, [a, b])
    _check(spec, out, a)


def test_kf_mul_small(field):
    spec, a, _, _, _ = field
    out = _run_kernel(spec, lambda kf, x: kf.mul_small(x, 13), [a])
    _check(spec, out, mont.mul_const(spec, a, 13))


def test_kf_const_mont(field):
    spec, a, _, _, _ = field
    out = _run_kernel(
        spec, lambda kf, x: kf.mul(x, kf.const_mont(12345, x)), [a]
    )
    c = mont.const(spec, 12345, (1,))
    _check(spec, out, mont.mul(spec, a, c))


@pytest.mark.slow
def test_pallas_interpret_mul():
    """One interpret-mode Pallas round trip pins the ref-plumbing used by the
    fused kernels (load from refs, store to refs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = get_spec("bn254_fp")
    n16 = spec.n_limbs
    a = mont.from_ints(spec, [3, spec.modulus - 1, 7, 11])
    b = mont.from_ints(spec, [5, spec.modulus - 2, 13, 17])

    def kern(a_ref, b_ref, o_ref):
        kf = KF(kspec(spec))
        A = kf.load16([a_ref[i, :] for i in range(n16)])
        B = kf.load16([b_ref[i, :] for i in range(n16)])
        rows = kf.store16(kf.mul(A, B), n16)
        for i in range(n16):
            o_ref[i, :] = rows[i]

    bs = pl.BlockSpec((n16, 4), lambda: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n16, 4), jnp.uint32),
        in_specs=[bs, bs],
        out_specs=bs,
        interpret=True,
    )(a, b)
    _check(spec, out, mont.mul(spec, a, b))
