#!/usr/bin/env python
"""GAT Graph-U-Net 3-fold CV driver — the script form of the reference's
``unet-transformer.py`` __main__ (ref: unet-transformer.py:478-541):
sklearn KFold(3, shuffle, seed 42), fresh model per fold, intermediate
reconstruction losses, per-fold full metric report."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out-dir", default="outputs/unet")
    ap.add_argument("--splits", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--eval-backend", default="device",
                    choices=["device", "networkx"])
    args = ap.parse_args()

    from examples._common import setup_runtime
    setup_runtime()

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.iox import save_prediction
    from fcsr_tpu.pipelines import run_gat_cv
    from fcsr_tpu.train.gat_loop import GATTrainConfig
    from fcsr_tpu.utils import set_seed
    from fcsr_tpu.evalx.plots import save_loss_curve

    set_seed(42)
    data = load_or_synthesize(args.data_dir)
    cfg = GATTrainConfig(epochs=args.epochs, dim=args.dim)
    result = run_gat_cv(data, splits=args.splits, cfg=cfg,
                        full_metrics=True, eval_backend=args.eval_backend)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "eval_metrics.json"), "w") as f:
        json.dump(result["fold_metrics"], f, indent=2)
    save_loss_curve(result["histories"][-1]["train"],
                    os.path.join(args.out_dir, "loss.png"),
                    val_hist=result["histories"][-1]["val"],
                    title="GAT U-Net training loss")
    if result["test_preds"] is not None:
        save_prediction(result["test_preds"],
                        os.path.join(args.out_dir, "submission.csv"),
                        ordering="colmajor")
    print("artifacts in", args.out_dir)


if __name__ == "__main__":
    main()
