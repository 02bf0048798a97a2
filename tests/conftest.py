"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (shard_map over a Mesh) are exercised without TPU hardware — the analogue
of the reference's purego CI run (.github/workflows/pr.yml) for our Pallas/jit
code paths (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: compile-bound test suite, huge win on re-runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gnark_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
