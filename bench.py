"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: BN254 G1 MSM throughput (points/sec) on one chip — the
reference's flagship benchmark (BenchmarkMultiExpG1, multiexp_test.go:301).
Also measures NTT and raw field-mul throughput; reported inside "extras".

vs_baseline anchor: the reference publishes no in-tree numbers (BASELINE.md).
We anchor against ~3.0e6 points/s for BN254 MSM 2^20, a representative figure
for gnark-crypto on a 32-core x86 server (hackmd.io/@gnark/eccbench order of
magnitude); see BASELINE.md.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_gnark_tpu_bench")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if jax.default_backend() != "tpu":
    try:
        # XLA:CPU AOT cache entries fail to re-load (machine-feature mismatch
        # on the same host) — without this, every cache hit silently
        # recompiles.  TPU executables reload fine; keep them cached there.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass


def _log(msg: str) -> None:
    """Stage progress to stderr (stdout stays one JSON line for the driver)."""
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MSM_PPS = 3.0e6  # documented anchor, see module docstring

LOG2_N = int(os.environ.get("BENCH_LOG2_N", "18"))
LOG2_NTT = int(os.environ.get("BENCH_LOG2_NTT", "20"))


def bench_field_mul():
    from gnark_crypto_tpu.fields import get_spec, mont

    spec = get_spec("bn254_fr")
    n = 1 << 20
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(spec.n_limbs, n), dtype=np.uint32)
    limbs[-1] = 0  # top limb zero -> value < 2^(16(n-1)) < q, canonical
    a = jax.numpy.asarray(limbs)
    chain = 8

    @jax.jit
    def f(x):
        y = x
        for _ in range(chain):
            y = mont.mul(spec, y, a)
        return y

    f(a).block_until_ready()
    t0 = time.perf_counter()
    reps = 4
    y = a
    for _ in range(reps):
        y = f(y)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    return n * chain * reps / dt  # muls/sec


def bench_ntt():
    from gnark_crypto_tpu.fields import get_spec
    from gnark_crypto_tpu.fft import Domain, ntt

    spec = get_spec("bn254_fr")
    n = 1 << LOG2_NTT
    d = Domain(spec, n, with_coset_tables=False)
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << 16, size=(spec.n_limbs, n), dtype=np.uint32)
    limbs[-1] = 0
    a = jax.numpy.asarray(limbs)
    f = jax.jit(lambda x: ntt(d, x))
    f(a).block_until_ready()
    t0 = time.perf_counter()
    out = f(a)
    out.block_until_ready()
    return time.perf_counter() - t0


def bench_msm():
    from gnark_crypto_tpu.curves import bn254, point
    from gnark_crypto_tpu.curves.fixed_base import batch_scalar_mul_fixed_base
    from gnark_crypto_tpu.fields import mont
    from gnark_crypto_tpu.msm.msm import default_window, msm_jit, pick_cap

    cs = bn254()
    n = 1 << LOG2_N
    rng = np.random.default_rng(2)
    ks = mont.from_ints(
        cs.fr, [int(x) for x in rng.integers(1, 2**62, n)], mont=False
    )
    pts = point.jac_to_affine(
        cs, batch_scalar_mul_fixed_base(cs, cs.generator, ks)
    )
    scalars = mont.from_ints(
        cs.fr,
        [int(a) * int(b) % cs.fr.modulus
         for a, b in zip(rng.integers(1, 2**63, n), rng.integers(1, 2**63, n))],
        mont=False,
    )
    c = min(default_window(n, cs.fr.bits), 14)
    cap = pick_cap(n, c)
    _log(f"msm setup done (n=2^{LOG2_N}, c={c}, cap={cap})")

    # warm up and settle on an overflow-free capacity (msm()'s retry logic,
    # done here so the timed pass is a single jitted call)
    while True:
        out, over = msm_jit(cs, pts, scalars, c, cap)
        jax.block_until_ready(out)
        _log(f"msm warm pass done (cap={cap}, overflow={int(over)})")
        if int(over) == 0:
            break
        cap *= 2
    t0 = time.perf_counter()
    out, over = msm_jit(cs, pts, scalars, c, cap)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n / dt, dt


def main():
    t_start = time.time()
    _log(f"start, backend={jax.default_backend()}")
    mul_rate = bench_field_mul()
    _log(f"field_mul {mul_rate:.3e}/s")
    ntt_time = bench_ntt()
    _log(f"ntt 2^{LOG2_NTT} {ntt_time:.4f}s")
    msm_pps, msm_time = bench_msm()
    _log(f"msm {msm_pps:.3e} pts/s")
    result = {
        "metric": f"bn254_g1_msm_points_per_sec_2^{LOG2_N}",
        "value": round(msm_pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(msm_pps / BASELINE_MSM_PPS, 4),
        "extras": {
            "field_mul_per_sec_bn254_fr": round(mul_rate, 1),
            f"ntt_2^{LOG2_NTT}_seconds_bn254_fr": round(ntt_time, 4),
            f"msm_2^{LOG2_N}_seconds": round(msm_time, 4),
            "bench_wall_seconds": round(time.time() - t_start, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
