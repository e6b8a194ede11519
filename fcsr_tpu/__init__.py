"""fcsr_tpu — TPU-native brain-graph super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
denisfouchard/fMRI-connectivity-super-resolution research stack
(brain connectome super-resolution: predict a 268x268 high-resolution
functional connectivity matrix from a 160x160 low-resolution one).

Design principles (TPU-first, not a port):
  * All per-sample Python loops of the reference become batched, jitted
    array programs (vmap / lax.scan) with static shapes.
  * Eigendecompositions of *data* (LR adjacency, HR labels) are hoisted
    out of the training loop and precomputed batched — the reference
    recomputes them every optimizer step (ref: utils/gsr_train.py:34,
    models/layers.py:27).
  * Scaling axis is the subject/batch dimension, sharded over a
    1-D device mesh via jax.sharding + shard_map (the reference is
    single-GPU only).
  * Evaluation graph metrics (centralities, k-core, histograms) run
    on-device; a NetworkX-backed evaluator is kept for bit-parity
    with the reference's official numbers.
"""

__version__ = "0.1.0"

from fcsr_tpu.core.vectorize import MatrixVectorizer  # noqa: F401


def __getattr__(name):
    """Lazy top-level access to the heavyweight subpackages
    (``fcsr_tpu.pipelines``, ``fcsr_tpu.train`` ...) without importing
    jax-compiled machinery at package-import time."""
    import importlib

    if name in {"core", "data", "models", "train", "evalx", "parallel",
                "iox", "utils", "native", "pipelines", "cli"}:
        return importlib.import_module(f"fcsr_tpu.{name}")
    raise AttributeError(f"module 'fcsr_tpu' has no attribute {name!r}")
