"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (shard_map over a Mesh) are exercised without TPU hardware — the analogue
of the reference's purego CI run (.github/workflows/pr.yml) for our Pallas/jit
code paths (SURVEY.md §4).

NB: the environment ships an always-on 'axon' remote-TPU platform plugin that
overrides JAX_PLATFORMS, so we must also force jax_platforms via jax.config.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: compile-bound test suite, huge win on re-runs.
# xla_caches must be OFF: XLA:CPU AOT executable serialization fails to
# re-load (machine-feature pseudo-flags like +prefer-no-scatter mismatch even
# on the same host), which silently turns every "cache hit" into a recompile
# plus a failed-load warning storm.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gnark_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass
