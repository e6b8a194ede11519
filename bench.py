#!/usr/bin/env python
"""Driver benchmark: full 3-fold GSR-Net train+eval throughput.

North star (BASELINE.md): full 3-fold GSR-Net train+eval under 60 s on one
v5e chip.  Metric: connectomes/sec processed across the whole pipeline
(training steps + eval forwards).  ``vs_baseline`` is the speedup vs the
north-star 60 s budget for the same workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    # Persistent compilation cache: the expensive XLA compiles happen once
    # per machine, not once per bench run.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/fcsr_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.pipelines import run_gsr_cv_fast
    from fcsr_tpu.train import GSRTrainConfig

    data = load_or_synthesize(os.environ.get("FCSR_DATA_DIR", "data"),
                              n_train=167, n_test=112, seed=42)

    cfg = GSRTrainConfig()  # reference config: 200 epochs, lr 1e-4
    splits = int(os.environ.get("FCSR_BENCH_SPLITS", "3"))

    t0 = time.perf_counter()
    result = run_gsr_cv_fast(data, cfg, splits=splits, full_metrics=False)
    elapsed = time.perf_counter() - t0

    work = result["n_train_steps"] + result["n_eval_forwards"]
    rate = work / elapsed
    baseline_rate = work / 60.0  # north-star budget for this workload
    out = {
        "metric": "connectomes/sec (160->268 upsample) train+infer",
        "value": round(rate, 2),
        "unit": "connectomes/sec",
        "vs_baseline": round(rate / baseline_rate, 3),
        "elapsed_s": round(elapsed, 3),
        "splits": splits,
        "epochs": cfg.epochs,
        "train_steps": result["n_train_steps"],
        "mean_val_mae": round(result["mean_mae"], 6),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
