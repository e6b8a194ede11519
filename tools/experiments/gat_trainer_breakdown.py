"""Where does the GAT trainer's wall clock go?

The bare fused step kernel costs ~87 us (gat_chain_batch.py) yet the
production trainer spends ~2 ms per work item (26.5 s / 13 304 —
outputs/gat/bench.json). Scaling the epoch count while PINNING the
chunk program (control_chunk_epochs stays 25, so epochs=50 and
epochs=100 reuse the identical compiled chunk — no fresh compiles)
separates per-run fixed cost (feature SVD, staging, final bulk pull)
from per-epoch cost (train scan + val pass):

    wall(ep) ~= fixed + ep * per_epoch

A third config with val sets shrunk to 1 subject (NOT semantics —
diagnostic only) splits per-epoch cost into train-scan vs val-pass.

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
import numpy as np

from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import gat_loop as gl

data = load_or_synthesize("data", n_train=167, n_test=112, seed=42)
lr_all = np.asarray(data["lr_train"], np.float32)
hr_all = np.asarray(data["hr_train"], np.float32)
folds = kfold_indices(len(lr_all), 3, seed=42)
print(f"device={jax.devices()[0]} folds={len(folds)} "
      f"tr={len(folds[0][0])} va={len(folds[0][1])}", flush=True)


def run(ep, fs, reps=2, tag=""):
    cfg = gl.GATTrainConfig(epochs=ep, fused_step=True)
    best = None
    for r in range(reps):
        t0 = time.perf_counter()
        gl.train_gat_folds_parallel(cfg, lr_all, hr_all, fs)
        best = time.perf_counter() - t0
        print(f"  epochs={ep:3d}{tag}: run {r}: {best:8.2f} s",
              flush=True)
    return best


print("production val sets (25-epoch chunk program, persistent-cached):",
      flush=True)
t100 = run(100, folds)
t50 = run(50, folds)
per_ep = (t100 - t50) / 50
fixed = t50 - 50 * per_ep
print(f"per-epoch marginal: {per_ep*1e3:.1f} ms   "
      f"fixed overhead: {fixed:.2f} s", flush=True)

# diagnostic: 1-subject val sets => val pass ~56x cheaper
tiny = [(tr, va[:1]) for tr, va in folds]
print("1-subject val sets (diagnostic — val cost isolated):", flush=True)
tv100 = run(100, tiny, tag=" tiny-val")
tv50 = run(50, tiny, tag=" tiny-val")
per_ep_t = (tv100 - tv50) / 50
print(f"per-epoch marginal (tiny val): {per_ep_t*1e3:.1f} ms", flush=True)
print(f"=> val pass per epoch ~{(per_ep - per_ep_t)*1e3:.1f} ms, "
      f"train scan + control ~{per_ep_t*1e3:.1f} ms", flush=True)
