#!/usr/bin/env python
"""Quality-sensitivity experiment for the synthetic benchmark generator.

Runs the exact bench workload (3-fold GSR-Net, reference config) on a
candidate synthetic dataset and reports trained val MAE vs the train-mean
baseline — the margin bench.py asserts on. Use to tune generator
parameters and to demonstrate that math-breaking mutations move the
number.

    python tools/bench_quality_experiment.py --flavor teacher --epochs 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flavor", default="teacher",
                    choices=["teacher", "lift"])
    ap.add_argument("--n", type=int, default=167)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--splits", type=int, default=3)
    ap.add_argument("--hr-noise", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused Pallas kernels (TPU only)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.expanduser("~/.cache/fcsr_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.data.synthetic import (synthesize_paired_connectomes,
                                         synthesize_teacher_connectomes)
    from fcsr_tpu.train import GSRTrainConfig
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    if args.flavor == "teacher":
        lr, hr = synthesize_teacher_connectomes(
            args.n, hr_noise=args.hr_noise, seed=args.seed)
    else:
        lr, hr = synthesize_paired_connectomes(args.n, seed=args.seed)

    cfg = GSRTrainConfig(epochs=args.epochs, fused_tail=args.fused,
                         fused_unet=args.fused)
    folds = kfold_indices(args.n, args.splits, seed=42)

    t0 = time.perf_counter()
    runner = GSRFoldRunner(cfg, lr, hr, folds)
    _, loss_hist, err_hist = runner.train()
    maes, _ = runner.evaluate()
    maes = np.asarray(maes)
    elapsed = time.perf_counter() - t0

    base = []
    for tr, va in folds:
        mean_hr = hr[tr].mean(axis=0)
        np.fill_diagonal(mean_hr, 1.0)
        gts = hr[va].copy()
        for m in gts:
            np.fill_diagonal(m, 1.0)
        base.append(np.abs(gts - mean_hr[None]).mean())

    out = {
        "flavor": args.flavor, "epochs": args.epochs,
        "hr_noise": args.hr_noise,
        "mean_val_mae": float(maes.mean()),
        "fold_maes": [float(m) for m in maes],
        "trainmean_baseline_mae": float(np.mean(base)),
        "margin": float(np.mean(base) - maes.mean()),
        "model_beats_baseline": bool(maes.mean() < np.mean(base)),
        "final_train_err": float(np.asarray(err_hist)[:, -1].mean()),
        "elapsed_s": round(elapsed, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
