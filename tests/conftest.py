"""Test harness setup.

Runs the whole suite on a virtual 8-device CPU mesh (the standard JAX
no-cluster pattern) so multi-chip sharding paths are exercised without TPU
hardware. NOTE: in this environment the env var JAX_PLATFORMS is pre-set to
the TPU plugin and is NOT overridable via os.environ — we must force the
platform through jax.config before any backend initialisation.
"""

import os
import sys

# make the suite runnable from any cwd (pytest /path/to/repo/tests)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

TEST_PLATFORM = os.environ.get("GCT2_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: many tests compile IDENTICAL programs through
# fresh jit closures (make_train_step per test) — the cache dedupes them
# within a run and across runs (measured: full suite 16.3 → ~8 min warm).
_CACHE_DIR = os.environ.get(
    "GCT2_TEST_CACHE_DIR", os.path.join(_REPO_ROOT, ".jax_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover — older jax without the knobs
    pass
# CLI-driven tests go through cli._setup_compilation_cache, which would
# otherwise re-point the cache at the user's ~/.cache default — keep them
# on the test cache dir.
os.environ.setdefault("GCT2_COMPILATION_CACHE", _CACHE_DIR)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
