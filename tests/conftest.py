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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
