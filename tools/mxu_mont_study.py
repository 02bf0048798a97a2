"""MXU Montgomery-multiplication study (SURVEY §7 S2; VERDICT r04 #4).

Question: can the MXU (the TPU's 128x128 systolic matmul unit — the chip's
dominant FLOP source) accelerate batched field multiplication, which today
runs entirely on VPU uint32 lanes (fields/pallas_mont.py, 4.5e8 muls/s)?

The mapping problem.  A matmul needs a SHARED operand: out[n, j] =
sum_k in[n, k] * W[k, j] reuses W across the whole batch.  In a batched
field multiply a[n]*b[n], BOTH operands vary per element — the limb products
a_i[n]*b_j[n] form a batched OUTER product (contraction size K=1), which the
MXU cannot amortize.  But Montgomery reduction contains two multiplications
by per-FIELD constants:

    m = (t mod R) * N'  mod R        N' = -q^-1 mod R   (shared!)
    u = m * q                        q                  (shared!)

Multiplication by a constant IS a matmul: writing the variable operand in
byte planes (values < 2^8, exactly representable in bf16) and the constant
as a banded "convolution matrix" of its byte limbs, each output column is
sum_k plane[n, k] * C[k, j] with every product < 2^16 and every column sum
< 2^23 — exact in the MXU's bf16 x bf16 -> f32 accumulation.  That moves
2 of the 3 big limb-product blocks (~2/3 of the multiply FLOPs) onto the
MXU; only the a*b schoolbook stays on the VPU.

This script implements that hybrid (separated-operand-scanning Montgomery:
T = a*b on VPU in 16-bit radix carry-save; m and u as einsum/MXU matmuls
over byte planes; carry fix-up on VPU), verifies it bit-exactly against
mont.mul, and times both paths.  Findings go to fields/MXU_STUDY.md.

Reference analogue: the role of the AVX-512 vector layer
(ecc/bn254/fr/vector_amd64.go) — the "which execution unit owns the field
mul" decision.

Usage: python tools/mxu_mont_study.py [--n 22] [--check-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gnark_tpu_bench")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_crypto_tpu.fields import get_spec, mont  # noqa: E402
from gnark_crypto_tpu.fields.spec import LIMB_MASK, FieldSpec  # noqa: E402

MASK16 = jnp.uint32(LIMB_MASK)


def _byte_limbs(x: int, nbytes: int) -> list[int]:
    return [(x >> (8 * i)) & 0xFF for i in range(nbytes)]


def _conv_matrix(const_bytes: list[int], in_shifts: list[int],
                 n_out: int) -> np.ndarray:
    """W[k, j] = const_bytes[j - in_shifts[k]] — multiply-by-constant as a
    banded matmul over byte planes.  in_shifts[k] is the byte position of
    input plane k; output column j accumulates every (plane, const-byte)
    pair landing at byte offset j."""
    nb = len(const_bytes)
    W = np.zeros((len(in_shifts), n_out), dtype=np.float32)
    for k, s in enumerate(in_shifts):
        for d, cb in enumerate(const_bytes):
            j = s + d
            if j < n_out:
                W[k, j] = cb
    return W


def build_mxu_mul(spec: FieldSpec):
    """Returns mul_mxu(a, b) -> Montgomery product, (n_limbs, N) u32 layout
    (same contract as mont.mul), with the m and m*q blocks on the MXU."""
    n = spec.n_limbs                     # 16-bit limbs
    R_bytes = 2 * n
    q = spec.modulus
    nprime = (-pow(q, -1, 1 << (16 * n))) % (1 << (16 * n))

    # --- matmul 1: m = (T_lo * N') mod R, byte-radix carry-save out ------
    # input planes: T_lo columns k (16-bit radix, value < 2^21) split into
    # 3 byte planes at byte positions 2k, 2k+1, 2k+2.
    in1_shifts = [2 * k + s for k in range(n) for s in range(3)]
    W1 = _conv_matrix(_byte_limbs(nprime, R_bytes), in1_shifts, R_bytes)

    # --- matmul 2: u = m * q, byte-radix carry-save out ------------------
    # input planes: m normalized to true byte limbs (< 2^8) — m must be
    # < R before this multiply or the final (T + m*q)/R exceeds 2q and a
    # single conditional subtract no longer reduces it.
    in2_shifts = list(range(R_bytes))
    W2 = _conv_matrix(_byte_limbs(q, R_bytes), in2_shifts, 2 * R_bytes)

    W1j = jnp.asarray(W1, dtype=jnp.bfloat16)
    W2j = jnp.asarray(W2, dtype=jnp.bfloat16)
    q16 = [int(x) for x in spec.q_limbs]

    @jax.jit
    def mul_mxu(a: jax.Array, b: jax.Array) -> jax.Array:
        N = a.shape[1]
        al = [a[i] for i in range(n)]
        bl = [b[i] for i in range(n)]
        # T = a*b, 16-bit-radix carry-save: T_k = sum_{i+j=k} lo(p_ij)
        #                                       + sum_{i+j=k-1} hi(p_ij)
        # (each term < 2^16, <= 2n terms -> T_k < 2^21).  VPU.
        T = [jnp.zeros((N,), jnp.uint32) for _ in range(2 * n)]
        for i in range(n):
            for j in range(n):
                p = al[i] * bl[j]
                T[i + j] = T[i + j] + (p & MASK16)
                T[i + j + 1] = T[i + j + 1] + (p >> 16)

        # MXU block 1: m = T_lo * N' mod R  (planes (3n, N) @ W1 -> (2n, N))
        # Contributions at byte offsets >= 2n are exact multiples of R and
        # are correctly dropped by the mod-R truncation of W1.
        planes1 = jnp.stack(
            [((T[k] >> (8 * s)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
             for k in range(n) for s in range(3)])
        m_cs = jnp.einsum("kn,kj->jn", planes1, W1j,
                          preferred_element_type=jnp.float32).astype(
                              jnp.uint32)

        # normalize m to true byte limbs mod R (VPU carry chain, 2n steps);
        # the carry out of byte 2n-1 is a multiple of R -> dropped.
        mb = []
        c = jnp.zeros((N,), jnp.uint32)
        for j in range(R_bytes):
            v = m_cs[j] + c
            mb.append(v & jnp.uint32(0xFF))
            c = v >> 8

        # MXU block 2: u = m * q  (planes (2n, N) @ W2 -> (4n, N))
        planes2 = jnp.stack(mb).astype(jnp.bfloat16)
        u_cs = jnp.einsum("kn,kj->jn", planes2, W2j,
                          preferred_element_type=jnp.float32)

        # combine: total = T + u  (u byte pairs -> 16-bit columns), VPU.
        u32 = u_cs.astype(jnp.uint32)
        tot = [T[k] + u32[2 * k] + (u32[2 * k + 1] << 8)
               for k in range(2 * n)]

        # low half reduces to 0 mod R by construction; fold its carry-out.
        c = jnp.zeros((N,), jnp.uint32)
        for k in range(n):
            c = (c + tot[k]) >> 16
        out = []
        for k in range(n, 2 * n):
            v = tot[k] + c
            out.append(v & MASK16)
            c = v >> 16
        overflow = c

        # conditional subtract q (t < 2q)
        borrow = jnp.zeros((N,), jnp.uint32)
        d = []
        for j in range(n):
            v = out[j] - jnp.uint32(q16[j]) - borrow
            d.append(v & MASK16)
            borrow = v >> 31
        use_sub = jnp.logical_or(overflow > 0, borrow == 0)
        return jnp.stack([jnp.where(use_sub, d[j], out[j])
                          for j in range(n)])

    return mul_mxu


def _rand_elems(spec, N, rng):
    limbs = rng.integers(0, 1 << 16, size=(spec.n_limbs, N)).astype(np.uint32)
    limbs[-1] = rng.integers(
        0, spec.modulus >> (16 * (spec.n_limbs - 1)), size=N,
        dtype=np.uint32)
    return jnp.asarray(limbs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="log2 batch for timing")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    spec = get_spec("bn254_fr")
    mul_mxu = build_mxu_mul(spec)
    rng = np.random.default_rng(7)

    # correctness vs the production path (which is oracle-tested)
    a = _rand_elems(spec, 4096, rng)
    b = _rand_elems(spec, 4096, rng)
    want = np.asarray(mont.mul(spec, a, b))
    got = np.asarray(mul_mxu(a, b))
    ok = (want == got).all()
    print(f"bit-exact vs mont.mul (N=4096): {'PASS' if ok else 'FAIL'}",
          file=sys.stderr)
    if not ok or args.check_only:
        sys.exit(0 if ok else 1)

    # timing: same chained-dependency harness as bench.bench_field_mul
    N = 1 << args.n
    a = _rand_elems(spec, N, rng)
    chain, reps = 8, 4

    def rate(fn):
        @jax.jit
        def f(x):
            y = x
            for _ in range(chain):
                y = fn(y, a)
            return y
        np.asarray(jax.block_until_ready(f(a))[0, :1])  # warm + fetch barrier
        t0 = time.perf_counter()
        y = a
        for _ in range(reps):
            y = f(y)
        np.asarray(jax.block_until_ready(y)[0, :1])
        return N * chain * reps / (time.perf_counter() - t0)

    r_vpu = rate(lambda x, y: mont.mul(spec, x, y))
    print(f"VPU (production pallas/mont) : {r_vpu:.3e} muls/s",
          file=sys.stderr)
    r_mxu = rate(mul_mxu)
    print(f"MXU hybrid (this study)      : {r_mxu:.3e} muls/s "
          f"({r_mxu / r_vpu:.2f}x)", file=sys.stderr)
    print(f'{{"mxu_hybrid_muls_per_sec": {r_mxu:.1f}, '
          f'"vpu_muls_per_sec": {r_vpu:.1f}, "ratio": {r_mxu / r_vpu:.3f}}}')


if __name__ == "__main__":
    main()
