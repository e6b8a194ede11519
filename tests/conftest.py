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
