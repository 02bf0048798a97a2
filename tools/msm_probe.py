"""MSM component microbenchmarks on the real chip (round-5 perf work).

Times, at bench shapes (n=2^24, c=15 -> nb=16384, P~1192):
  1. lax.sort_key_val(keys, iota)            -- the per-window sort
  2. jnp.argsort alone                       -- current code path
  3. jnp.bincount vs searchsorted-on-sorted  -- counts
  4. dense build, CURRENT layout: xy (32,n); xy[:, idx] + moveaxis
  5. dense build, ROW layout: xyr (n,32); xyr[idx] + transpose to (P,32,nb)
  6. rounds kernel alone on dummy dense data
  7. host fetch latency of the counts array vs a 1-scalar reduce

Usage: python tools/msm_probe.py [--log2n 24] [--stages 1,2,...]
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

T0 = time.time()


def log(msg):
    print(f"[probe +{time.time()-T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(name, f, *args, reps=3):
    out = f(*args)
    _sync(out)  # compile
    del out     # free the warmup result before timing (2x-peak OOM at 2^24)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        _sync(out)
        del out
    dt = (time.perf_counter() - t0) / reps
    log(f"{name}: {dt*1e3:.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=24)
    ap.add_argument("--stages", default="1,2,3,4,5,6,7")
    args = ap.parse_args()
    stages = set(int(s) for s in args.stages.split(","))

    from gnark_crypto_tpu.msm.pallas_msm import (
        _round_counts_split, _run_rounds)
    from gnark_crypto_tpu.fields import get_spec

    n = 1 << args.log2n
    c = 15
    nb = 1 << (c - 1)
    fp = get_spec("bn254_fp")
    fr = get_spec("bn254_fr")
    P, _ = _round_counts_split(n, nb, fr.modulus, c)
    log(f"n=2^{args.log2n} c={c} nb={nb} P={P} backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    keys_h = rng.integers(0, nb + 1, size=n, dtype=np.int32)
    keys = jnp.asarray(keys_h)
    n16 = fp.n_limbs
    xy = (jnp.asarray(rng.integers(0, 1 << 16, size=(2 * n16, n),
                                   dtype=np.uint32))
          if 4 in stages else None)
    xyr = (jnp.asarray(np.ascontiguousarray(
               rng.integers(0, 1 << 16, size=(n, 2 * n16), dtype=np.uint32)))
           if 5 in stages else None)

    if 1 in stages:
        f = jax.jit(lambda k: jax.lax.sort_key_val(
            k, jnp.arange(n, dtype=jnp.int32)))
        timeit("sort_key_val 2^{}".format(args.log2n), f, keys)
    if 2 in stages:
        f = jax.jit(lambda k: jnp.argsort(k))
        timeit("argsort", f, keys)
    if 3 in stages:
        f = jax.jit(lambda k: jnp.bincount(k, length=nb + 1))
        timeit("bincount", f, keys)
        sk = jax.jit(lambda k: jax.lax.sort(k))(keys)
        _sync(sk)
        f2 = jax.jit(lambda s: jnp.searchsorted(
            s, jnp.arange(nb + 2, dtype=jnp.int32)))
        timeit("searchsorted counts (on sorted)", f2, sk)

    # shared index setup for gather stages
    order = jax.jit(lambda k: jnp.argsort(k).astype(jnp.int32))(keys)
    _sync(order)
    counts = jax.jit(lambda k: jnp.bincount(k, length=nb + 1))(keys)
    starts = jnp.cumsum(counts) - counts
    iota_r = jnp.arange(P, dtype=jnp.int32)
    pos = starts[1:][None, :] + iota_r[:, None]          # (P, nb)
    idx = jax.jit(lambda o, p: o[jnp.clip(p, 0, n - 1)])(order, pos)
    _sync(idx)

    if 4 in stages:
        f = jax.jit(lambda xy, idx: jnp.moveaxis(xy[:, idx], 0, 1))
        timeit("dense CURRENT col-gather+moveaxis", f, xy, idx, reps=1)
    if 5 in stages:
        f = jax.jit(lambda xyr, idx: xyr[idx])
        timeit("dense ROW-gather (P,nb,32)", f, xyr, idx, reps=1)
        f2 = jax.jit(lambda xyr, idx: jnp.swapaxes(xyr[idx], 1, 2))
        timeit("dense ROW-gather + transpose (P,32,nb)", f2, xyr, idx, reps=1)
        fi = jax.jit(lambda o, p: o[jnp.clip(p, 0, n - 1)])
        timeit("idx gather alone (P,nb)", fi, order, pos)
    if 6 in stages:
        dense = jnp.zeros((P, 2 * n16, nb), jnp.uint32)
        # valid-looking candidate codes: all 1 (add)
        code = jnp.ones((P, 1, nb), jnp.uint32)
        f = jax.jit(lambda d, co: _run_rounds(fp, 0, P, nb, False, d, co))
        timeit("rounds kernel alone", f, dense, code, reps=1)
    if 7 in stages:
        W = 17
        cc = jnp.tile(counts[None], (W, 1))
        _sync(cc)
        t0 = time.perf_counter()
        np.asarray(cc)
        log(f"host fetch counts (17,{nb+1}): "
            f"{(time.perf_counter()-t0)*1e3:.1f} ms")
        one = jnp.max(cc)
        _sync(one)
        red = jax.jit(lambda c: jnp.max(c))
        o = red(cc)
        t0 = time.perf_counter()
        np.asarray(red(cc))
        log(f"host fetch 1 scalar (incl reduce): "
            f"{(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
