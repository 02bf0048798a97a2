"""TPU-scale bit-exactness gates (VERDICT r03 #5; SURVEY §7 milestone ②).

Runs ON THE REAL CHIP (not under the CPU-forced pytest conftest):
  gate 1: NTT 2^16 — fused Pallas passes vs the stage-at-a-time XLA path;
  gate 2: MSM 2^16 — rounds-based msm_fast vs the exact segmented-scan msm;
  gate 3: the BASELINE end-to-end config — BLS12-381 KZG with SRS 2^20:
          commit -> open -> verify on device, plus a tampered-proof reject.

Writes a summary to TPU_GATES.md (committed as the gate record).

Usage:  python tools/tpu_gates.py [--log2-srs 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gnark_tpu_bench")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []
T0 = time.time()


def log(msg):
    print(f"[gates +{time.time()-T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def _write_md(final=False):
    lines = [
        "# TPU bit-exactness gates",
        "",
        f"Backend: `{jax.default_backend()}`, wall: {time.time()-T0:.0f}s "
        f"(tools/tpu_gates.py; SURVEY §7 milestone ② + VERDICT r04 #2/#3)"
        + ("" if final else " — RUN IN PROGRESS"),
        "",
    ]
    for name, ok, detail in RESULTS:
        lines.append(f"- **{name}**: {'PASS' if ok else 'FAIL'}"
                     + (f" — {detail}" if detail else ""))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_GATES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lines


def record(name, ok, detail=""):
    RESULTS.append((name, ok, detail))
    log(f"{name}: {'PASS' if ok else 'FAIL'} {detail}")
    _write_md()  # incremental: a cut-off run still leaves its record


def gate_ntt():
    import jax.numpy as jnp

    from gnark_crypto_tpu.fft import Domain, ntt, ntt_fused
    from gnark_crypto_tpu.fields import get_spec

    spec = get_spec("bn254_fr")
    n = 1 << 16
    d = Domain(spec, n, with_coset_tables=False)
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(spec.n_limbs, n)).astype(np.uint32)
    limbs[-1] = rng.integers(0, spec.modulus >> (16 * (spec.n_limbs - 1)),
                             size=n, dtype=np.uint32)
    a = jnp.asarray(limbs)
    got = np.asarray(ntt_fused(d, a))
    want = np.asarray(jax.jit(ntt)(d, a))
    record("ntt_2^16_fused_vs_xla", (got == want).all())


def gate_msm():
    import jax.numpy as jnp

    from gnark_crypto_tpu.curves import bn254, point
    from gnark_crypto_tpu.curves.fixed_base import batch_scalar_mul_fixed_base
    from gnark_crypto_tpu.fields import mont
    from gnark_crypto_tpu.msm.msm import msm
    from gnark_crypto_tpu.msm.pallas_msm import msm_fast

    cs = bn254()
    n = 1 << 16
    rng = np.random.default_rng(1)
    ks = mont.from_ints(cs.fr, [int(x) for x in rng.integers(1, 2**62, n)],
                        mont=False)
    pts = point.jac_to_affine(cs, batch_scalar_mul_fixed_base(
        cs, cs.generator, ks))
    limbs = rng.integers(0, 1 << 16, size=(cs.fr.n_limbs, n)).astype(np.uint32)
    limbs[-1] = rng.integers(0, cs.fr.modulus >> (16 * (cs.fr.n_limbs - 1)),
                             size=n, dtype=np.uint32)
    s = jnp.asarray(limbs)
    log("msm gate: setup done")
    fast = msm_fast(cs, pts, s, c=15)
    a_fast = point.affine_to_ints(cs, point.jac_to_affine(cs, fast))
    log("msm gate: fast path done")
    exact = msm(cs, pts, s, c=15)
    a_exact = point.affine_to_ints(cs, point.jac_to_affine(cs, exact))
    record("msm_2^16_fast_vs_exact", a_fast.item() == a_exact.item())


def _bench_points_scalars(n, rng):
    """Bench-shaped inputs: tiled points (2^16 distinct) + full-width
    uniform scalars."""
    import jax.numpy as jnp

    from gnark_crypto_tpu.curves import bn254, point
    from gnark_crypto_tpu.curves.fixed_base import batch_scalar_mul_fixed_base
    from gnark_crypto_tpu.fields import mont

    cs = bn254()
    n_base = min(n, 1 << 16)
    ks = mont.from_ints(cs.fr, [int(x) for x in rng.integers(1, 2**62, n_base)],
                        mont=False)
    base = point.jac_to_affine(cs, batch_scalar_mul_fixed_base(
        cs, cs.generator, ks))
    if n > n_base:
        reps = n // n_base
        tile = jax.jit(lambda a: jnp.tile(a, (1, reps)))
        pts = point.Affine(tile(base.x), tile(base.y))
    else:
        pts = base
    limbs = rng.integers(0, 1 << 16, size=(cs.fr.n_limbs, n), dtype=np.uint32)
    limbs[-1] = rng.integers(0, cs.fr.modulus >> (16 * (cs.fr.n_limbs - 1)),
                             size=n, dtype=np.uint32)
    return cs, pts, jnp.asarray(limbs)


def gate_msm_2e24():
    """Gate 4 (VERDICT r04 #3): BASELINE.md's literal wording — MSM at 2^24
    bit-exact: msm_fast vs the exact segmented-scan path on the SAME input."""
    import jax.numpy as jnp

    from gnark_crypto_tpu.curves import point
    from gnark_crypto_tpu.msm.msm import msm
    from gnark_crypto_tpu.msm.pallas_msm import fast_window, msm_fast

    n = 1 << 24
    rng = np.random.default_rng(4)
    cs, pts, s = _bench_points_scalars(n, rng)
    log("msm 2^24 gate: setup done")
    c = fast_window(n, cs.fr.bits)
    fast = msm_fast(cs, pts, s, c)
    a_fast = point.affine_to_ints(cs, point.jac_to_affine(cs, fast))
    log(f"msm 2^24 gate: fast path done (c={c})")
    exact = msm(cs, pts, s, c=15)
    a_exact = point.affine_to_ints(cs, point.jac_to_affine(cs, exact))
    record("msm_2^24_fast_vs_exact", a_fast.item() == a_exact.item())


def gate_ntt_2e24():
    """Gate 5 (VERDICT r04 #3): NTT at 2^24, fused Pallas vs XLA path."""
    import jax.numpy as jnp

    from gnark_crypto_tpu.fft import Domain, ntt, ntt_fused
    from gnark_crypto_tpu.fields import get_spec

    spec = get_spec("bn254_fr")
    n = 1 << 24
    d = Domain(spec, n, with_coset_tables=False)
    rng = np.random.default_rng(5)
    limbs = rng.integers(0, 1 << 16, size=(spec.n_limbs, n)).astype(np.uint32)
    limbs[-1] = rng.integers(0, spec.modulus >> (16 * (spec.n_limbs - 1)),
                             size=n, dtype=np.uint32)
    a = jnp.asarray(limbs)
    got = np.asarray(ntt_fused(d, a))
    log("ntt 2^24 gate: fused done")
    want = np.asarray(jax.jit(ntt)(d, a))
    record("ntt_2^24_fused_vs_xla", (got == want).all())


def gate_kzg(log2_srs: int):
    import dataclasses

    from gnark_crypto_tpu import registry
    from gnark_crypto_tpu.commit import kzg
    from gnark_crypto_tpu.commit.kzg import _to_host_point
    from gnark_crypto_tpu.curves import bls12_381
    from gnark_crypto_tpu.fields import mont
    from gnark_crypto_tpu.registry import ID

    cs = bls12_381()
    tw = registry.pairing_tower(ID.BLS12_381)
    size = 1 << log2_srs
    t0 = time.time()
    srs = registry.new_srs(ID.BLS12_381, size=size, tau=192837465564738291)
    log(f"kzg gate: SRS 2^{log2_srs} built in {time.time()-t0:.0f}s")
    q = cs.fr.modulus
    rng = np.random.default_rng(2)
    deg = size - 1
    # full-bit-width coefficients (narrow ones concentrate MSM windows)
    raw = rng.integers(0, 256, size=(deg, 32), dtype=np.uint8)
    coeffs = [int.from_bytes(r.tobytes(), "big") % q for r in raw]
    poly = mont.from_ints(cs.fr, coeffs)
    t0 = time.time()
    C = kzg.commit(cs, srs.pk, poly)
    jax.block_until_ready(C.x)
    t_commit = time.time() - t0
    log(f"kzg gate: commit in {t_commit:.1f}s")
    a = 31415926535897932384
    t0 = time.time()
    pr = kzg.open_(cs, srs.pk, poly, a)
    t_open = time.time() - t0
    want = 0
    for cf in reversed(coeffs):
        want = (want * a + cf) % q
    ok_eval = pr.claimed_value == want
    t0 = time.time()
    Ch = _to_host_point(cs, C)
    ok = kzg.verify(tw, cs, srs.vk, Ch, pr, a)
    t_verify = time.time() - t0
    bad = dataclasses.replace(pr, claimed_value=(pr.claimed_value + 1) % q)
    ok_neg = not kzg.verify(tw, cs, srs.vk, Ch, bad, a)
    record(
        f"kzg_bls12381_srs_2^{log2_srs}_e2e",
        ok_eval and ok and ok_neg,
        f"commit {t_commit:.1f}s open {t_open:.1f}s verify {t_verify:.1f}s",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2-srs", type=int, default=20)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    log(f"backend: {jax.default_backend()}")
    if "ntt" not in skip:
        gate_ntt()
    if "msm" not in skip:
        gate_msm()
    if "kzg" not in skip:
        gate_kzg(args.log2_srs)
    if "msm24" not in skip:
        gate_msm_2e24()
    if "ntt24" not in skip:
        gate_ntt_2e24()

    lines = _write_md(final=True)
    print("\n".join(lines))
    if not all(ok for _, ok, _ in RESULTS):
        sys.exit(1)


if __name__ == "__main__":
    main()
