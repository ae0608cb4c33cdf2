"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip shardings are validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU execution is exercised
by ``bench.py`` and the driver's compile checks, not the unit tests.
"""

import os

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

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
