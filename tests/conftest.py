"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run against this virtual mesh — the TPU-native
analog of a fake distributed backend. Must run before jax is imported.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
# the config route is authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persist XLA:CPU executables across test runs: the slow lane is
# dominated by single-core compiles of trainer programs; the warm lane
# reuses them from disk (see utils/compile_cache.py; disable with
# FCSR_NO_COMPILE_CACHE=1 to measure true cold times).
from fcsr_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.environ.get(
    "FCSR_TEST_CACHE_DIR",
    os.path.expanduser("~/.cache/fcsr_jax_tests")))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_symmetric(rng, n, density=1.0, seed_offset=0):
    """Random nonnegative symmetric matrix with zero diagonal, values [0,1)."""
    m = rng.random((n, n))
    if density < 1.0:
        m = m * (rng.random((n, n)) < density)
    m = np.triu(m, k=1)
    return (m + m.T).astype(np.float32)
