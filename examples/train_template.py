#!/usr/bin/env python
"""Spectral-norm residual MLP training driver — the script form of
``training_template.ipynb`` (3 contiguous-window folds, MSE + AdamW +
plateau LR, per-fold full metric suite, column-major submission).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out-dir", default="outputs/mlp")
    ap.add_argument("--k-folds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--eval-backend", default="device",
                    choices=["device", "networkx"])
    args = ap.parse_args()

    from examples._common import setup_runtime
    setup_runtime()

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.iox import save_prediction, save_pytree
    from fcsr_tpu.pipelines import run_mlp_cv
    from fcsr_tpu.utils import set_seed
    from fcsr_tpu.evalx.plots import save_loss_curve

    set_seed(42)
    data = load_or_synthesize(args.data_dir)
    result = run_mlp_cv(data, k_folds=args.k_folds, p_val=0.33,
                        num_epochs=args.epochs, full_metrics=True,
                        eval_backend=args.eval_backend)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "eval_metrics.json"), "w") as f:
        json.dump(result["fold_metrics"], f, indent=2)
    tr_h, va_h, _ = result["histories"][-1]
    save_loss_curve(tr_h, os.path.join(args.out_dir, "loss.png"),
                    val_hist=va_h, title="SpectralResMLP training loss")
    save_pytree(result["variables"],
                os.path.join(args.out_dir, "model.msgpack"))
    if result["test_preds"] is not None:
        save_prediction(result["test_preds"],
                        os.path.join(args.out_dir, "submission.csv"),
                        ordering="colmajor")
    print("artifacts in", args.out_dir)


if __name__ == "__main__":
    main()
