"""Shared runtime setup for the example drivers — the same two steps
every other entry point applies (fcsr_tpu/cli.py, bench.py):

  1. persistent XLA compile cache (first-ever server compiles are slow;
     every later process reuses the on-disk executables), and
  2. the JAX_PLATFORMS config shim (the axon TPU plugin ignores the env
     var, so ``JAX_PLATFORMS=cpu python examples/...`` would silently
     run on TPU without it).
"""

import os


def setup_runtime():
    from fcsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
