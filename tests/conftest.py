"""Test harness config.

Multi-chip logic is tested on a virtual 8-device CPU mesh: the env vars
must be set before jax initializes its backends, hence this module-level
setup (the same technique the reference could not use — it had to test
MPI on a real cluster; we get N devices from one process).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
