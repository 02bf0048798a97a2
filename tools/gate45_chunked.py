"""Gates 4-5 retry with a chunked exact reference (TPU_GATES.md plan).

Gate 4 crashed the TPU worker when the exact segmented-scan path
materialized 17 windows of sort payload at 2^24 in one program.  Here the
exact reference is computed as 16 x 2^20 chunks folded with jac_add --
exactly the associativity argument behind msm/checkpoint.py -- so each
program is 1/16th the footprint.  Gate 5 is unchanged (NTT 2^24 fused vs
XLA).  Appends PASS/FAIL lines to stdout; TPU_GATES.md is updated by hand
from the output (this script must never run past the round clock, so it
does not own the record file).

Usage: python tools/gate45_chunked.py [--skip ntt24|msm24]
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

T0 = time.time()


def log(msg):
    print(f"[gate45 +{time.time()-T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def gate_msm24():
    from tpu_gates import _bench_points_scalars  # same inputs as gate 4

    from gnark_crypto_tpu.curves import point
    from gnark_crypto_tpu.msm.checkpoint import msm_checkpointed
    from gnark_crypto_tpu.msm.pallas_msm import fast_window, msm_fast

    n = 1 << 24
    rng = np.random.default_rng(4)
    cs, pts, s = _bench_points_scalars(n, rng)
    log("msm 2^24: setup done")
    c = fast_window(n, cs.fr.bits)
    fast = msm_fast(cs, pts, s, c)
    a_fast = point.affine_to_ints(cs, point.jac_to_affine(cs, fast))
    log(f"msm 2^24: fast path done (c={c})")
    state = "/tmp/gate4_exact.ckpt"
    if os.path.exists(state):
        os.remove(state)
    exact = msm_checkpointed(cs, pts, s, state, c=15, chunk_log2=20,
                             use_fast=False)
    a_exact = point.affine_to_ints(cs, point.jac_to_affine(cs, exact))
    ok = a_fast.item() == a_exact.item()
    print(f"GATE msm_2^24_fast_vs_exact_chunked: {'PASS' if ok else 'FAIL'}",
          flush=True)


def gate_ntt24():
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
    log("ntt 2^24: fused done")
    want = np.asarray(jax.jit(ntt)(d, a))
    ok = (got == want).all()
    print(f"GATE ntt_2^24_fused_vs_xla: {'PASS' if ok else 'FAIL'}",
          flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    log(f"backend: {jax.default_backend()}")
    if "ntt24" not in skip:
        gate_ntt24()
    if "msm24" not in skip:
        gate_msm24()


if __name__ == "__main__":
    main()
