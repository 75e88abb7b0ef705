"""Test harness config: force CPU backend with a virtual 8-device mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual host-platform device mesh (SURVEY.md section 4's
multi-host test recipe).  Must run before any jax import.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (single real TPU via a
# tunnel); tests must force-override to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("OSFSC_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize forces jax_platforms="axon,cpu" regardless of the
# env var; override the config directly so tests really run on the virtual
# CPU mesh (and not through the single-chip TPU tunnel).
jax.config.update(
    "jax_platforms", os.environ.get("OSFSC_TEST_PLATFORM", "cpu")
)
jax.config.update("jax_compilation_cache_dir", "/tmp/osfsc_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (excluded from the smoke tier "
        "via -m 'not slow')",
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
