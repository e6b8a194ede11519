"""Where does the GAT trainer's wall clock go?

The bare fused step kernel costs ~87 us (gat_chain_batch.py) yet the
production trainer spends ~2 ms per work item (26.5 s / 13 304 —
outputs/gat/bench.json). This times the trainer's actual compiled
pieces at the production config (167 subjects, 3 folds, 100 epochs):

  * epoch_all  — one epoch of fused train steps, vmapped over 3 folds
  * val_all    — one epoch's validation pass (unfused flax forward,
                 vmapped over ~56 val subjects x 3 folds)
  * run 25-epoch chunk — the shipped on-device-control program

Run on the real TPU: python tools/experiments/gat_trainer_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.data.datamodule import kfold_splits
from fcsr_tpu.train import gat_loop as gl

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

cfg = gl.GATTrainConfig(epochs=EPOCHS, fused_step=True)
data = load_or_synthesize("data", n_train=167, n_test=112, seed=42)
lr_all = np.asarray(data["lr_train"], np.float32)
hr_all = np.asarray(data["hr_train"], np.float32)
folds = kfold_splits(len(lr_all), 3, seed=42, shuffle=True)
print(f"device={jax.devices()[0]} folds={len(folds)} "
      f"tr={len(folds[0][0])} va={len(folds[0][1])}", flush=True)


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s}: {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


# Reach into the trainer's own closures by rebuilding them exactly as
# train_gat_folds_parallel does (host_control path exposes epoch_all /
# val_all as jitted pieces; we re-create minimal equivalents here by
# calling the trainer once with epochs=1 to warm caches, then timing
# its internals via the public entry under different epoch counts).
t0 = time.perf_counter()
gl.train_gat_folds_parallel(cfg._replace_epochs(1) if hasattr(cfg, "_replace_epochs")
                            else gl.GATTrainConfig(epochs=1, fused_step=True),
                            lr_all, hr_all, folds)
print(f"whole-run epochs=1 (cold+warm caches): {time.perf_counter()-t0:.1f}s",
      flush=True)

for ep in (1, 5, 10, 25):
    c = gl.GATTrainConfig(epochs=ep, fused_step=True)
    t0 = time.perf_counter()
    gl.train_gat_folds_parallel(c, lr_all, hr_all, folds)
    print(f"whole run, epochs={ep:3d}: {time.perf_counter()-t0:8.2f} s",
          flush=True)
