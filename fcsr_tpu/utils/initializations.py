"""Initializer helpers (ref: utils/initializations.py).

``glorot_uniform_square`` mirrors the reference's
``weight_variable_glorot`` (uniform +-sqrt(6 / (2 * dim)) for a square
matrix). Note: the reference imports it into its GSR layer but never uses
it — GSRLayer initializes with randn (ref: models/layers.py:6,18); kept
here for API completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["glorot_uniform_square", "glorot_init"]


def glorot_uniform_square(output_dim: int, seed: int = 0) -> np.ndarray:
    """Numpy variant matching the reference's signature."""
    init_range = np.sqrt(6.0 / (output_dim + output_dim))
    rng = np.random.default_rng(seed)
    return rng.uniform(-init_range, init_range,
                       (output_dim, output_dim)).astype(np.float32)


def glorot_init(key: jax.Array, shape, dtype=jnp.float32):
    """jax initializer form: uniform +-sqrt(6 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[-2], shape[-1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)
