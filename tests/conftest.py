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

# The axon environment programmatically forces its own platform and the
# terminal overrides XLA_FLAGS, so env vars alone are ignored — force the
# CPU platform and the 8-device count through jax.config (must run before
# backend initialization).  Set DSPI_TEST_TPU=1 to run the suite against
# the real accelerator instead.
import jax  # noqa: E402

if not os.environ.get("DSPI_TEST_TPU"):
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

# Persistent compilation cache: repeated runs skip XLA compiles entirely.
# The tests get their OWN cache dir: TPU sessions compile host-side CPU
# executables with different machine flags (prefer-no-scatter/-gather),
# and loading those from a shared cache produced instruction-order numeric
# flake right at the 1e-6 fidelity bound.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DSPI_JAX_CACHE",
                                     "/tmp/dspi_jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD5B1)


@pytest.fixture(autouse=True)
def _rng_spy(request, rng):
    """Debug aid: record the session rng state entering each test so a
    full-suite-order failure can be reproduced standalone."""
    spy = os.environ.get("DSPI_RNG_SPY")
    if spy:
        import json
        with open(spy, "a") as f:
            f.write(json.dumps({"test": request.node.nodeid,
                                "state": rng.bit_generator.state}) + "\n")
    yield
