"""Split the GAT trainer's ~19 s fixed overhead into its parts.

gat_trainer_breakdown.py measured wall(ep) ~= 18.7 s + 107 ms * ep for
the production fold-parallel GAT run. This times each fixed-cost piece
the trainer pays once per run, in the order it pays them:

  1. precompute_gat_features — host SVD of 167 (160,160) matrices
  2. device staging (lr/hr stacks over the tunnel)
  3. model.init x 3 folds + ravel
  4. a0 normalize jit
  5. chunk_fn trace+compile-lookup (first call, persistent-cached)
  6. final bulk pulls (bflat/hists)

Run on the real TPU: python tools/experiments/gat_fixed_cost.py
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
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import gat_loop as gl
from fcsr_tpu.utils.transfer import device_put_fast

data = load_or_synthesize("data", n_train=167, n_test=112, seed=42)
lr_np = np.asarray(data["lr_train"], np.float32)
hr_np = np.asarray(data["hr_train"], np.float32)
folds = kfold_indices(len(lr_np), 3, seed=42)
cfg = gl.GATTrainConfig(epochs=100, fused_step=True)
print(f"device={jax.devices()[0]}", flush=True)

marks = [("start", time.perf_counter())]


def mark(name):
    marks.append((name, time.perf_counter()))
    a, b = marks[-2], marks[-1]
    print(f"{name:32s}: {b[1] - a[1]:8.3f} s", flush=True)


x_np = gl.precompute_gat_features(lr_np, dim=cfg.dim)
mark("precompute_gat_features (SVD)")

lr_d = device_put_fast(lr_np)
hr_d = device_put_fast(hr_np)
jax.block_until_ready((lr_d, hr_d))
mark("device staging lr+hr")

model = cfg.model()
from jax.flatten_util import ravel_pytree
flats = []
for j in range(3):
    k_init, k_drop = jax.random.split(jax.random.PRNGKey(42 + j))
    variables = model.init({"params": k_init, "dropout": k_drop},
                           jnp.eye(cfg.n_nodes, dtype=jnp.float32) * 0.5)
    flat, unravel = ravel_pytree(variables["params"])
    flats.append(flat)
jax.block_until_ready(flats)
mark("model.init x3 + ravel")

# the whole-run entry, twice: second run shows the steady fixed total
for r in range(2):
    t0 = time.perf_counter()
    gl.train_gat_folds_parallel(cfg, lr_np, hr_np, folds)
    print(f"full run {r}: {time.perf_counter() - t0:8.2f} s", flush=True)
