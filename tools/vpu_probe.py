"""VPU op-rate probe: what does a uint32 multiply actually cost on this chip?

The MSM rounds kernel and the Montgomery kernels are built on u32 lane
multiplies of 16-bit limbs (fields/pallas_mont.py).  TPUs are float-first
machines; if Mosaic lowers a 32-bit integer multiply to a multi-op sequence,
reformulating the limb products in f32 (8-bit splits, exact below 2^24)
could raise the kernel roofline.  This probe times long dependent chains of
each candidate op inside one VMEM-resident Pallas kernel:

  u32_mul   : x = x * y           (the current kernels' primitive)
  u32_addmul: x = x * y + z       (CIOS inner step shape)
  u32_add   : x = x + y           (baseline ALU rate)
  f32_mul   : x = x * y
  f32_fma   : x = x * y + z
  u16_mul_f32: 16x16->32 product via two 8-bit f32 muls + i32 recombine
               (what a float reformulation would actually pay)

Each chain step depends on the previous (true latency-throughput product is
hidden by running many lanes: 8 sublanes x 128 lanes x TILE).  Rates are
ops/sec across the whole array.

Usage: python tools/vpu_probe.py
"""

from __future__ import annotations

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

ROWS, COLS = 256, 1024          # one VMEM tile: 256*1024*4B = 1 MB
CHAIN = 256                      # dependent steps per kernel pass
GRID = 64                        # kernel passes per launch


def _kernel(body, x_ref, y_ref, o_ref):
    x = x_ref[...]
    y = y_ref[...]
    for i in range(CHAIN):
        x = body(x, y)
    o_ref[...] = x


def _time(name, body, dtype, results):
    x = jnp.asarray(
        np.random.default_rng(0).integers(1, 1 << 15, (ROWS, COLS)),
        dtype=dtype)
    y = jnp.asarray(
        np.random.default_rng(1).integers(1, 1 << 15, (ROWS, COLS)),
        dtype=dtype)

    fn = pl.pallas_call(
        functools.partial(_kernel, body),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), dtype),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    jf = jax.jit(fn)
    np.asarray(jax.block_until_ready(jf(x, y)))[0, 0]  # warm + fetch
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        o = jf(x, y)
    np.asarray(jax.block_until_ready(o))[0, 0]
    dt = time.perf_counter() - t0
    rate = ROWS * COLS * CHAIN * GRID * reps / dt
    results[name] = rate
    print(f"{name:12s}: {rate:.3e} ops/s", file=sys.stderr)


def main():
    results = {}
    _time("u32_add", lambda x, y: x + y, jnp.uint32, results)
    _time("u32_mul", lambda x, y: x * y, jnp.uint32, results)
    _time("u32_addmul", lambda x, y: x * y + y, jnp.uint32, results)
    _time("u32_mask_shift", lambda x, y: (x & jnp.uint32(0xFFFF)) + (y >> 16),
          jnp.uint32, results)
    _time("f32_mul", lambda x, y: x * y, jnp.float32, results)
    _time("f32_fma", lambda x, y: x * y + y, jnp.float32, results)

    def _f(v):  # u32 (< 2^16) -> f32, via i32 (Mosaic has no u32->f32)
        return v.astype(jnp.int32).astype(jnp.float32)

    def _u(v):  # f32 (< 2^31, integral) -> u32
        return v.astype(jnp.int32).astype(jnp.uint32)

    def u16_mul_via_f32(x, y):
        # 16x16->32 product via 8-bit f32 splits (all exact below 2^24)
        x0 = _f(x & jnp.uint32(0xFF))
        x1 = _f(x >> 8)
        yf0 = _f(y & jnp.uint32(0xFF))
        yf1 = _f(y >> 8)
        lo = _u(x0 * yf0)
        mid = _u(x1 * yf0 + x0 * yf1)
        hi = _u(x1 * yf1)
        return lo + (mid << 8) + (hi << 16)

    _time("u16mul_f32", u16_mul_via_f32, jnp.uint32, results)
    import json
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
