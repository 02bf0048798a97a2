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

import pytest

# ---------------------------------------------------------------------------
# Fast/slow tier split (VERDICT r03 #7): the fast tier (`-m "not slow"`,
# ideally with `-n 2`) must stay runnable cold; compile-heavy files and
# parametrizations are auto-marked slow here (centralized — measured with
# tools/time_tests.sh).  Slow-tier coverage still runs in full test sessions.
# ---------------------------------------------------------------------------

_SLOW_FILE_PREFIXES = (
    "test_fused_point.py",     # pallas interpret of full point kernels
    "test_kernel_lang.py",     # kernel-radix CIOS compile per field
    "test_gt.py",              # E12 Karabina/torus graph compiles
    "test_cyclotomic.py",      # hard-part ladders per family
    "test_hash_to_g2.py",      # sqrt_ratio exponent chains per curve
    "test_pairing.py",         # Miller loop + final exp compiles
    "test_pairing_fixed.py",   # fixed-Q Miller + final exp compiles
    "test_towers.py",
    "test_new_families.py",
    "test_commit_schemes.py",  # FRI/SHPLONK/FFLONK prove+verify
    "test_plookup.py",
    "test_sswu.py",
)

# individual tests inside slow files that stay fast (host-side / tiny)
_FAST_IDS = (
    "cofactor_pinned",
    "index_maps",
)

# pairing-backed KZG verifies are compile-heavy; commitment/open math is not
_SLOW_IDS = (
    "test_kzg.py::test_open_verify_roundtrip",
    "test_kzg.py::test_batch_open_verify",
    "test_kzg.py::test_fold_proof_and_multi_points",
    # three extra exact-path MSM compiles (chunked + resumed shapes)
    "test_msm.py::test_msm_checkpointed_resume",
)

# parametrized field subsets: only these stay in the fast tier for the
# widest field/fft sweeps
_FAST_FIELDS = ("bn254_fr", "bn254_fp", "babybear", "goldilocks")


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        nodeid = item.nodeid
        if any(k in nodeid for k in _FAST_IDS):
            continue
        fname = nodeid.split("::")[0].rsplit("/", 1)[-1]
        if fname.startswith(_SLOW_FILE_PREFIXES):
            item.add_marker(slow)
            continue
        if any(nodeid.endswith(s.split("::")[1]) and s.split("::")[0] == fname
               for s in _SLOW_IDS):
            item.add_marker(slow)
            continue
        if fname in ("test_fields.py", "test_fft.py") and "[" in nodeid:
            param = nodeid[nodeid.index("[") + 1 : -1]
            if not any(fld in param for fld in _FAST_FIELDS):
                item.add_marker(slow)
