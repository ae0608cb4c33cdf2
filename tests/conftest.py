"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip shardings are validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU execution is exercised
by ``bench.py`` and the driver's compile checks, not the unit tests.
"""

import os

# CSA_TPU_TPU_TESTS=1 leaves the real accelerator registered so the
# opt-in tests in test_tpu_real.py exercise the actual chip; everything
# else runs on the virtual CPU mesh.
_REAL_TPU = bool(os.environ.get("CSA_TPU_TPU_TESTS"))

if not _REAL_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon sitecustomize registers the tunneled TPU backend at interpreter
# start and pins the platform; jax.config wins over the env var, so force
# CPU explicitly for the unit tests.
import jax

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
