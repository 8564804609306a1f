"""Test configuration.

Runs the suite on a virtual 8-device CPU mesh so sharding/distribution code
paths are exercised without TPU hardware (≅ SURVEY.md §4's prescription;
the reference's tests were single-GPU only — multi-device tests are new
capability).

NOTE: this environment pre-imports jax (sitecustomize) pinned to a remote
TPU platform, so plain env vars are too late — we must override through
jax.config before the backend initializes. TPU execution is covered by
bench.py and the driver's dryrun, not the unit suite.

Mirrors the reference's fixed-seed pattern (python/tests/conftest.py:13-20,
utils.py:25-27 seed_rand).
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA_FLAGS (pre-backend-init)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")

# Persistent compile cache: most of the suite's 20+ min wall time is CPU
# jit compiles, and unlike the axon TPU backend the CPU cache DOES hit
# across processes — repeat runs (and xdist workers) skip almost all of
# it. Lives under tests/ so it never collides with the TPU bench cache.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def rand_seed():
    np.random.seed(0xabcdef)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
