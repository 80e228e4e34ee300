"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's graft entry;
the test suite validates numerics and sharding on host CPU so it runs
anywhere.  Must set the env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD5B1)
