"""Test harness: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count` (the JAX-native analog of the
reference's untested multi-node path; see SURVEY.md §4). Env vars must be set
before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may import jax before this conftest runs (latching env-derived
# config), so force the platform through the live config object too — otherwise
# the first backend init tries to reach real accelerator hardware.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite re-jits the same tiny models every run
jax.config.update("jax_compilation_cache_dir", "/tmp/scldm_tpu_pytest_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jax_devices():
    import jax

    return jax.devices()
