#!/usr/bin/env python
"""Where does the GAT family bench's COLD pass go?

Runs in a fresh process with the persistent compile cache enabled (the
shipped configuration) and times, for the production fused-step
fold-parallel trainer chunk program:

  * host trace+lower (jaxpr construction + StableHLO emission),
  * compile (client cache hit -> deserialization; miss -> server),
  * first execution (remote-frontend program load + run),

plus the end-to-end pass total for context. Usage:

    python tools/experiments/gat_cold_breakdown.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fcsr_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np
from fcsr_tpu.data import load_or_synthesize

t0 = time.perf_counter()
data = load_or_synthesize("data", n_train=167, n_test=112, seed=42)
print(f"data: {time.perf_counter()-t0:.1f}s", flush=True)

from fcsr_tpu.pipelines import run_gat_cv_fast
from fcsr_tpu.train.gat_loop import GATTrainConfig

cfg = GATTrainConfig(epochs=100, fused_step=True)

import jax

# monkey-time jax.jit compile phases by timing the full pass and the
# pieces the library exposes; the chunk program is built lazily inside
# train_gat_folds_parallel, so we time the pass end-to-end and rely on
# jax's own logging for the split
os.environ["JAX_LOG_COMPILES"] = "1"
jax.config.update("jax_log_compiles", True)

import logging
records = []
class H(logging.Handler):
    def emit(self, r):
        records.append((time.perf_counter(), r.getMessage()))
for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
             "jax._src.compiler", "jax"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    lg.addHandler(H())

t0 = time.perf_counter()
res = run_gat_cv_fast(data, cfg=cfg, splits=3, seed=42)
tot = time.perf_counter() - t0
tm = res["timings"]
print(f"cold pass: total={tot:.1f}s train={tm['train']:.1f}s "
      f"predict={tm['predict']:.1f}s", flush=True)
for t, m in records:
    if "Finished" in m or "Compiling" in m or "compil" in m.lower():
        print(f"  [{t:.1f}] {m[:160]}", flush=True)
