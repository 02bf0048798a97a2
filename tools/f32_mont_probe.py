"""f32-limb Montgomery multiplication probe (the MSM_LAYOUT.md lever (b)).

The production kernel field (fields/kernel_lang.py) does CIOS over 12/13-bit
limbs in uint32 lanes: ~2n^2 u32 multiplies per field mul (n=20 for bn254).
TPU VPUs are float-first; if the 32-bit integer multiply lowers to a
multi-op sequence (tools/vpu_probe.py measures this), a float formulation
with single-rounded FMAs can raise the roofline:

  radix r=9, n=29 limbs for a 254-bit field; every value in the pipeline is
  an exact integer below 2^24 (f32 mantissa), so all arithmetic is EXACT:
  - full product T_k = sum_{i+j=k} a_i*b_j: <= 29 products of < 2^18 each
    -> T_k < 2^23.1;  841 FMAs;
  - Montgomery reduction, product-scanning: sequential in k, m_k from
    T_k mod 512 (floor-based, exact), then T_{k+j} += m_k*q_j (841 FMAs);
    every T never exceeds 58 products + carry < 2^24;
  - carry normalization of the high half (n steps of floor/subtract).

Total ~1.9e3 single-rate float ops vs ~1.7e3 mixed ops (820 of them u32
muls) for the integer path.  This probe checks the f32 path bit-exact
against the big-int oracle and races both kernels on chained dependent
multiplies (all VMEM-resident).

Usage: python tools/f32_mont_probe.py [--check-only]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gnark_tpu_bench")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_crypto_tpu.fields import get_spec  # noqa: E402
from gnark_crypto_tpu.fields.kernel_lang import KF, kspec  # noqa: E402

R_BITS = 9
BASE = 1 << R_BITS
F_BASE = np.float32(BASE)
F_INV = np.float32(1.0 / BASE)


def f32_plan(modulus: int):
    n = -(-(modulus.bit_length() + 2) // R_BITS)  # R = 2^(9n) > 4q
    q_limbs = [(modulus >> (R_BITS * i)) & (BASE - 1) for i in range(n)]
    qinv = (-pow(modulus, -1, BASE)) % BASE
    return n, q_limbs, qinv


def f32_mul(n, q_limbs, qinv, a, b):
    """Montgomery product of two lists of n f32 limb vectors (< 2q domain,
    normalized limbs < 512); returns same form.  All values exact in f32."""
    fq = [np.float32(x) for x in q_limbs]
    fqinv = np.float32(qinv)
    zero = jnp.zeros_like(a[0])
    T = [zero] * (2 * n)
    for i in range(n):
        ai = a[i]
        for j in range(n):
            T[i + j] = T[i + j] + ai * b[j]
    c = zero
    for k in range(n):
        t = T[k] + c
        t0 = t - jnp.floor(t * F_INV) * F_BASE          # t mod 512, exact
        mk = t0 * fqinv
        mk = mk - jnp.floor(mk * F_INV) * F_BASE        # m_k < 512
        t = t + mk * fq[0]
        for j in range(1, n):
            T[k + j] = T[k + j] + mk * fq[j]
        c = jnp.floor(t * F_INV)                        # t/512 exact
    out = []
    for k in range(n, 2 * n):
        t = T[k] + c
        c = jnp.floor(t * F_INV)
        out.append(t - c * F_BASE)
    return out  # < 2q (R > 4q), top carry c is 0


def _chain_kernel_f32(n, q_limbs, qinv, chain, x_ref, a_ref, o_ref):
    x = [x_ref[i] for i in range(n)]
    a = [a_ref[i] for i in range(n)]
    for _ in range(chain):
        x = f32_mul(n, q_limbs, qinv, x, a)
    for i in range(n):
        o_ref[i] = x[i]


def _chain_kernel_u32(kf, n16, chain, x_ref, a_ref, o_ref):
    x = kf.load16([x_ref[i] for i in range(n16)])
    a = kf.load16([a_ref[i] for i in range(n16)])
    for _ in range(chain):
        x = kf.mul(x, a)
    rows = kf.store16(x, n16)
    for i in range(n16):
        o_ref[i] = rows[i]


def _to_f32_limbs(vals, n, N):
    out = np.zeros((n, N), np.float32)
    for col, v in enumerate(vals):
        for i in range(n):
            out[i, col] = (v >> (R_BITS * i)) & (BASE - 1)
    return out


def _from_f32_limbs(arr):
    n, N = arr.shape
    a = arr.astype(np.int64)
    return [sum(int(a[i, col]) << (R_BITS * i) for i in range(n))
            for col in range(N)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--n", type=int, default=16, help="log2 lanes for timing")
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()

    spec = get_spec("bn254_fp")
    q = spec.modulus
    n, q_limbs, qinv = f32_plan(q)
    print(f"f32 plan: r={R_BITS}, n={n} limbs", file=sys.stderr)

    # --- correctness: chain of muls vs big-int Montgomery, interpret ok ---
    N = 256
    rng = np.random.default_rng(3)
    xs = [int.from_bytes(rng.bytes(32), "big") % q for _ in range(N)]
    as_ = [int.from_bytes(rng.bytes(32), "big") % q for _ in range(N)]
    chain = 4
    R = 1 << (R_BITS * n)
    Rinv = pow(R, -1, q)
    want = xs
    for _ in range(chain):
        want = [(x * a * Rinv) % q for x, a in zip(want, as_)]

    x = jnp.asarray(_to_f32_limbs(xs, n, N))
    a = jnp.asarray(_to_f32_limbs(as_, n, N))
    on_cpu = jax.default_backend() != "tpu"
    fn = pl.pallas_call(
        functools.partial(_chain_kernel_f32, n, q_limbs, qinv, chain),
        out_shape=jax.ShapeDtypeStruct((n, N), jnp.float32),
        interpret=on_cpu,
    )
    got = [v % q for v in _from_f32_limbs(np.asarray(fn(x, a)))]
    ok = got == want
    print(f"f32 mont mul chain bit-exact (N={N}, chain={chain}): "
          f"{'PASS' if ok else 'FAIL'}", file=sys.stderr)
    if not ok or args.check_only:
        sys.exit(0 if ok else 1)

    # --- timing race: f32 kernel vs production u32 kernel ----------------
    lanes = 1 << args.n
    chain = args.chain
    ks = kspec(spec)
    kf = KF(ks)
    n16 = spec.n_limbs

    xs = [int.from_bytes(rng.bytes(32), "big") % q for _ in range(8)]
    x32 = np.zeros((n16, lanes), np.uint32)
    xf = np.zeros((n, lanes), np.float32)
    for col in range(lanes):
        v = xs[col % 8]
        for i in range(n16):
            x32[i, col] = (v >> (16 * i)) & 0xFFFF
        for i in range(n):
            xf[i, col] = (v >> (R_BITS * i)) & (BASE - 1)

    def rate(fn, x, a, reps=8):
        jf = jax.jit(fn)
        np.asarray(jax.block_until_ready(jf(x, a)))[0, :1]
        t0 = time.perf_counter()
        o = x
        for _ in range(reps):
            o = jf(o, a)
        np.asarray(jax.block_until_ready(o))[0, :1]
        return lanes * chain * reps / (time.perf_counter() - t0)

    f32_fn = pl.pallas_call(
        functools.partial(_chain_kernel_f32, n, q_limbs, qinv, chain),
        out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.float32),
    )
    u32_fn = pl.pallas_call(
        functools.partial(_chain_kernel_u32, kf, n16, chain),
        out_shape=jax.ShapeDtypeStruct((n16, lanes), jnp.uint32),
    )
    xj, aj = jnp.asarray(xf), jnp.asarray(xf)
    r_f32 = rate(f32_fn, xj, aj)
    print(f"f32 kernel (r=9, n={n})    : {r_f32:.3e} muls/s", file=sys.stderr)
    x32j = jnp.asarray(x32)
    r_u32 = rate(u32_fn, x32j, x32j)
    print(f"u32 kernel (r={ks.r}, n={ks.n}): {r_u32:.3e} muls/s",
          file=sys.stderr)
    import json
    print(json.dumps({"f32_muls_per_sec": round(r_f32, 1),
                      "u32_muls_per_sec": round(r_u32, 1),
                      "ratio": round(r_f32 / r_u32, 3)}))


if __name__ == "__main__":
    main()
