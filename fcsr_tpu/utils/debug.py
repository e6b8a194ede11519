"""Debug utilities.

The reference has no sanitizers (SURVEY §5); the JAX-native equivalents:

  * ``nan_debug()`` — scoped ``jax_debug_nans``: any NaN produced inside
    jitted code raises with a traceback to the producing op.
  * ``eager_debug()`` — scoped ``jax_disable_jit`` for step-through
    debugging of traced code.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["nan_debug", "eager_debug"]


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def eager_debug(enable: bool = True):
    old = jax.config.jax_disable_jit
    jax.config.update("jax_disable_jit", enable)
    try:
        yield
    finally:
        jax.config.update("jax_disable_jit", old)
