"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: BN254 G1 MSM throughput (points/sec) on one chip — the
reference's flagship benchmark (BenchmarkMultiExpG1, multiexp_test.go:301).
Also measures NTT (2^20 and 2^24) and raw field-mul throughput, reported in
"extras" along with per-stage wall times (the profiling mandated by
SURVEY.md §5).

Guard rails (the round-2 bench burned its whole TPU budget in a retry loop):
- a global deadline (BENCH_DEADLINE seconds, default 3300): stages check it
  before starting and are skipped — never aborted mid-flight — if exceeded;
- the MSM path is the exact segmented-scan accumulation (msm/msm.py): single
  jitted pass, no data-dependent retries, memory O(chunk);
- scalars are FULL-WIDTH uniform mod q (256 random bits each; the round-2
  bench generated 126-bit products that never wrapped mod q).

vs_baseline anchor: the reference publishes no in-tree numbers (BASELINE.md).
We anchor against ~3.0e6 points/s for BN254 MSM, a representative figure for
gnark-crypto on a 32-core x86 server (hackmd.io/@gnark/eccbench order of
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

_T0 = time.time()
DEADLINE = float(os.environ.get("BENCH_DEADLINE", "3300"))


def _log(msg: str) -> None:
    """Stage progress to stderr (stdout stays one JSON line for the driver)."""
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def _left() -> float:
    return DEADLINE - (time.time() - _T0)


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MSM_PPS = 3.0e6  # documented anchor, see module docstring

LOG2_N = int(os.environ.get("BENCH_LOG2_N", "18"))
LOG2_N_BIG = int(os.environ.get("BENCH_LOG2_N_BIG", "24"))
LOG2_NTT = int(os.environ.get("BENCH_LOG2_NTT", "20"))
LOG2_NTT_BIG = int(os.environ.get("BENCH_LOG2_NTT_BIG", "24"))


def _sync(x):
    jax.block_until_ready(x)
    # the remote-TPU platform's block_until_ready can be a no-op; a scalar
    # device->host fetch is the reliable barrier
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _uniform_scalars_fast(spec, n, rng):
    """Vectorized full-bit-width scalars < q.

    The top limb is drawn uniformly in [0, q >> 16*(L-1)) so values use the
    FULL modulus bit width (a clamped top limb concentrates the MSM's top
    signed window into a fraction of its buckets, which is both
    unrepresentative and tickles the skew tail path); the excluded sliver
    above (q>>shift)<<shift is < 2^-13 of the range — irrelevant here."""
    n_limbs = spec.n_limbs
    limbs = rng.integers(0, 1 << 16, size=(n_limbs, n), dtype=np.uint32)
    top = spec.modulus >> (16 * (n_limbs - 1))
    if top <= 1:
        limbs[-1] = 0
    else:
        limbs[-1] = rng.integers(0, top, size=n, dtype=np.uint32)
    return limbs


def bench_field_mul():
    from gnark_crypto_tpu.fields import get_spec, mont

    spec = get_spec("bn254_fr")
    n = 1 << 20
    rng = np.random.default_rng(0)
    a = jax.numpy.asarray(_uniform_scalars_fast(spec, n, rng))
    chain = 8

    @jax.jit
    def f(x):
        y = x
        for _ in range(chain):
            y = mont.mul(spec, y, a)
        return y

    _sync(f(a))
    t0 = time.perf_counter()
    reps = 4
    y = a
    for _ in range(reps):
        y = f(y)
    _sync(y)
    dt = time.perf_counter() - t0
    return n * chain * reps / dt  # muls/sec


def bench_ntt(log2n):
    from gnark_crypto_tpu.fields import get_spec
    from gnark_crypto_tpu.fft import Domain, fused_available, ntt, ntt_fused

    spec = get_spec("bn254_fr")
    n = 1 << log2n
    d = Domain(spec, n, with_coset_tables=False)
    rng = np.random.default_rng(1)
    a = jax.numpy.asarray(_uniform_scalars_fast(spec, n, rng))
    if fused_available(spec, n) and jax.default_backend() == "tpu":
        # fused multi-stage Pallas passes (fft/pallas_ntt.py)
        f = lambda x: ntt_fused(d, x)
    else:
        # Domain is a pytree: twiddle tables enter as runtime ARGUMENTS (at
        # 2^24 closure-captured tables embedded ~0.5 GB of HLO constants ->
        # HTTP 413 at remote compile, the r03 bench-killer).
        jf = jax.jit(ntt)
        f = lambda x: jf(d, x)
    _sync(f(a))
    t0 = time.perf_counter()
    _sync(f(a))
    return time.perf_counter() - t0


def _msm_setup(n, rng):
    """n points (tiled from 2^16 distinct) + full-width uniform scalars."""
    from gnark_crypto_tpu.curves import bn254, point
    from gnark_crypto_tpu.curves.fixed_base import batch_scalar_mul_fixed_base
    from gnark_crypto_tpu.fields import mont

    cs = bn254()
    n_base = min(n, 1 << 16)
    ks = mont.from_ints(
        cs.fr, [int(x) for x in rng.integers(1, 2**62, n_base)], mont=False
    )
    base = point.jac_to_affine(cs, batch_scalar_mul_fixed_base(cs, cs.generator, ks))
    if n > n_base:
        reps = n // n_base
        tile = jax.jit(lambda a: jax.numpy.tile(a, (1, reps)))
        pts = point.Affine(tile(base.x), tile(base.y))  # tiled ON DEVICE
    else:
        pts = base
    scalars = jax.numpy.asarray(_uniform_scalars_fast(cs.fr, n, rng))
    return cs, pts, scalars


def bench_msm(log2n):
    from gnark_crypto_tpu.msm.pallas_msm import fast_window, msm_fast

    n = 1 << log2n
    rng = np.random.default_rng(2)
    cs, pts, scalars = _msm_setup(n, rng)
    c = fast_window(n, cs.fr.bits)
    _log(f"msm setup done (n=2^{log2n}, c={c})")

    out = msm_fast(cs, pts, scalars, c)
    _sync(out)
    _log(f"msm warm (compile) pass done")
    t0 = time.perf_counter()
    out = msm_fast(cs, pts, scalars, c)
    _sync(out)
    dt = time.perf_counter() - t0
    return n / dt, dt


# --- perf regression guard (internal/bench/main.go:20-80 analogue) --------
# last recorded round's numbers; bench.py prints deltas and WARNs on >10%
# regressions so a silent perf loss is caught the round it happens.
PREV_ROUND = {
    "round": 4,
    "msm_2^18_points_per_sec": 346087.0,
    "msm_2^24_points_per_sec": 664637.4,
    "field_mul_per_sec_bn254_fr": 452186721.3,
    "ntt_2^20_seconds_bn254_fr": 0.0673,     # lower is better
    "ntt_2^24_seconds_bn254_fr": 0.492,
}


def _regression_guard(extras):
    deltas = {}
    for key, prev in PREV_ROUND.items():
        if key == "round" or key not in extras:
            continue
        cur = extras[key]
        lower_better = key.startswith("ntt_")
        ratio = (prev / cur) if lower_better else (cur / prev)
        deltas[f"delta_vs_r{PREV_ROUND['round']}_{key}"] = round(ratio, 3)
        if ratio < 0.9:
            _log(f"WARN perf regression {key}: {cur} vs r{PREV_ROUND['round']}"
                 f" {prev} ({ratio:.2f}x)")
            extras.setdefault("perf_regressions", []).append(key)
    extras.update(deltas)


def _stage(extras, key, min_left, fn):
    """Run one bench stage with its own try/except — NO stage may kill the
    round (three rounds died to a single uncaught stage error, VERDICT r03).
    Returns fn() result or None."""
    if _left() <= min_left:
        extras[f"{key}_skipped"] = f"deadline ({_left():.0f}s left)"
        _log(f"{key}: skipped, {_left():.0f}s left < {min_left}s")
        return None
    t0 = time.time()
    try:
        out = fn()
        extras[f"stage_s_{key}"] = round(time.time() - t0, 1)
        return out
    except Exception as e:
        extras[f"{key}_error"] = repr(e)[:300]
        extras[f"stage_s_{key}"] = round(time.time() - t0, 1)
        _log(f"{key} FAILED after {time.time() - t0:.0f}s: {e!r}")
        return None


def main():
    extras = {"backend": jax.default_backend(), "deadline_s": DEADLINE}
    _log(f"start, backend={jax.default_backend()}")
    # SURVEY §5: profiling baked in — BENCH_PROFILE=1 wraps the run in a
    # jax.profiler trace (inspect with tensorboard / xprof)
    prof_dir = None
    if os.environ.get("BENCH_PROFILE"):
        prof_dir = os.environ.get("BENCH_PROFILE_DIR", "/tmp/gnark_tpu_trace")
        jax.profiler.start_trace(prof_dir)
        extras["profile_trace_dir"] = prof_dir

    # Stage order: flagship first (MSM is THE reference headline,
    # multiexp_test.go:301), so a late-stage crash can never zero it out.
    mul_rate = _stage(extras, "field_mul", 120, bench_field_mul)
    if mul_rate is not None:
        extras["field_mul_per_sec_bn254_fr"] = round(mul_rate, 1)
        _log(f"field_mul {mul_rate:.3e}/s")

    msm_pps, msm_time = None, None
    r = _stage(extras, "msm", 300, lambda: bench_msm(LOG2_N))
    if r is not None:
        msm_pps, msm_time = r
        extras[f"msm_2^{LOG2_N}_points_per_sec"] = round(msm_pps, 1)
        extras[f"msm_2^{LOG2_N}_seconds"] = round(msm_time, 4)
        _log(f"msm 2^{LOG2_N} {msm_pps:.3e} pts/s")

    big_pps = None
    r = _stage(extras, "msm_big", 600, lambda: bench_msm(LOG2_N_BIG))
    if r is not None:
        big_pps, big_time = r
        extras[f"msm_2^{LOG2_N_BIG}_points_per_sec"] = round(big_pps, 1)
        extras[f"msm_2^{LOG2_N_BIG}_seconds"] = round(big_time, 4)
        _log(f"msm 2^{LOG2_N_BIG} {big_pps:.3e} pts/s")

    r = _stage(extras, "ntt", 180, lambda: bench_ntt(LOG2_NTT))
    if r is not None:
        extras[f"ntt_2^{LOG2_NTT}_seconds_bn254_fr"] = round(r, 4)
        _log(f"ntt 2^{LOG2_NTT} {r:.4f}s")

    r = _stage(extras, "ntt_big", 300, lambda: bench_ntt(LOG2_NTT_BIG))
    if r is not None:
        extras[f"ntt_2^{LOG2_NTT_BIG}_seconds_bn254_fr"] = round(r, 4)
        _log(f"ntt 2^{LOG2_NTT_BIG} {r:.4f}s")

    if prof_dir is not None:
        jax.profiler.stop_trace()
    extras["bench_wall_seconds"] = round(time.time() - _T0, 1)
    _regression_guard(extras)
    # headline: the 2^24 figure — BASELINE.json's metric is stated at 2^24
    # (VERDICT r04 weak #9); the 2^18 number stays in extras.
    if big_pps is not None:
        result = {
            "metric": f"bn254_g1_msm_points_per_sec_2^{LOG2_N_BIG}",
            "value": round(big_pps, 1),
            "unit": "points/sec",
            "vs_baseline": round(big_pps / BASELINE_MSM_PPS, 4),
            "extras": extras,
        }
    elif msm_pps is not None:
        result = {
            "metric": f"bn254_g1_msm_points_per_sec_2^{LOG2_N}",
            "value": round(msm_pps, 1),
            "unit": "points/sec",
            "vs_baseline": round(msm_pps / BASELINE_MSM_PPS, 4),
            "extras": extras,
        }
    else:
        result = {
            "metric": "bn254_fr_field_muls_per_sec",
            "value": round(mul_rate or 0.0, 1),
            "unit": "muls/sec",
            "vs_baseline": 0.0,
            "extras": extras,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # last-ditch: ALWAYS emit the JSON line
        print(json.dumps({
            "metric": "bench_error", "value": 0.0, "unit": "none",
            "vs_baseline": 0.0, "extras": {"error": repr(e)[:300]},
        }))
