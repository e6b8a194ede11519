"""Persistent XLA compilation cache (AOT-persist across processes).

The round-2 "MLP cold compile 430-830 s" is a ONE-TIME-per-machine
cost: the wide-output SpectralResMLP backward and the chunked
device-control programs compile slowly on the TPU compile service, but
the compiled executables are fully cacheable. With the cache enabled,
a fresh process's cold pass drops from 459 s to 30.5 s measured on v5e
(outputs/mlp/bench.json; the GSR headline path was already < 25 s and
also benefits). The cache covers Mosaic/Pallas custom kernels too —
they are serialized inside the XLA executable.

Entry points (CLI, bench.py, tools/family_bench.py) call
``enable_persistent_cache()`` before any jit executes. Library code
(pipelines, trainers) deliberately does NOT — mutating global jax
config from a library import would surprise embedding applications.

Knobs:
  * ``JAX_COMPILATION_CACHE_DIR`` — override the cache location
    (default ``~/.cache/fcsr_jax``).
  * ``FCSR_NO_COMPILE_CACHE=1`` — disable entirely (e.g. to measure
    true first-ever compile times).
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_ENABLED = False
_DIR: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point jax at a persistent on-disk compilation cache.

    Returns the cache directory in use, or None when disabled via
    ``FCSR_NO_COMPILE_CACHE=1``. Re-invoking with a DIFFERENT directory
    switches the cache: jax materializes its cache object lazily on
    first use and then ignores later ``jax_compilation_cache_dir``
    config updates, so a plain config update would silently keep
    writing to the old directory — we reset the cache object too.
    """
    global _ENABLED, _DIR
    if os.environ.get("FCSR_NO_COMPILE_CACHE") == "1":
        return None
    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/fcsr_jax"))
    if _ENABLED and cache_dir == _DIR:
        return cache_dir

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: tiny programs are numerous on the fold drivers
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if _ENABLED:  # dir change after first use: drop the live cache object
        try:
            from jax._src import compilation_cache as _cc
            _cc.reset_cache()
        except Exception:  # pragma: no cover - jax-internal API drift
            pass
    _ENABLED = True
    _DIR = cache_dir
    return cache_dir
