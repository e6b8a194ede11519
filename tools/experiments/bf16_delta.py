"""Measure the bf16 fast-mode speed/quality delta vs f32 on the unfused
fold-parallel trainer (same teacher dataset/config as bench.py; chunked
protocol so both passes share one program). Results recorded in PERF.md.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import GSRFoldRunner

data = load_or_synthesize(None, n_train=167, n_test=1, seed=42)
folds = kfold_indices(167, 3, seed=42)
for dtype in ("f32", "bf16"):
    cfg = GSRTrainConfig(compute_dtype=dtype)
    runner = GSRFoldRunner(cfg, data["lr_train"], data["hr_train"], folds)
    chunk = max(1, cfg.epochs // 4)
    def full():
        t0 = time.perf_counter()
        runner.train(chunk_epochs=chunk)
        maes, _ = runner.evaluate()
        return time.perf_counter() - t0, np.asarray(maes)
    t_cold, _ = full()
    t_steady, maes = full()
    print(f"{dtype}: steady={t_steady:.2f}s cold={t_cold:.1f}s "
          f"mean_val_mae={maes.mean():.6f} fold_maes={maes.round(6).tolist()}",
          flush=True)
