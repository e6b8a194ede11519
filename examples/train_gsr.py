#!/usr/bin/env python
"""GSR-Net k-fold training driver — the script form of the reference's
``training_gsr.ipynb`` (Args config in cell-4, fold loop in cell-6,
row-major submission in cell-7).

Usage:
    python examples/train_gsr.py [--data-dir data] [--splits 5]
                                 [--fast] [--out-dir outputs/gsr]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out-dir", default="outputs/gsr")
    ap.add_argument("--splits", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--full-metrics", action="store_true")
    ap.add_argument("--eval-backend", default="device",
                    choices=["device", "networkx"])
    args = ap.parse_args()

    from examples._common import setup_runtime
    setup_runtime()

    import json

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.iox import save_prediction, save_pytree
    from fcsr_tpu.pipelines import run_gsr_cv, run_gsr_cv_fast
    from fcsr_tpu.train import GSRTrainConfig
    from fcsr_tpu.utils import set_seed
    from fcsr_tpu.evalx.plots import save_loss_curve

    set_seed(42)
    data = load_or_synthesize(args.data_dir)
    cfg = GSRTrainConfig(epochs=args.epochs)

    runner = run_gsr_cv_fast if args.fast else run_gsr_cv
    result = runner(data, cfg, splits=args.splits,
                    full_metrics=args.full_metrics,
                    eval_backend=args.eval_backend)

    os.makedirs(args.out_dir, exist_ok=True)
    print("fold MAEs:", result["fold_maes"], "mean:", result["mean_mae"])
    if result.get("fold_metrics"):
        # eval_metrics.json: what three_fold_vis.py consumes (and the
        # reference's own artifact, outputs/*/eval_metrics.json)
        with open(os.path.join(args.out_dir, "eval_metrics.json"),
                  "w") as f:
            json.dump(result["fold_metrics"], f, indent=2)
    save_pytree(result["params"],
                os.path.join(args.out_dir, "gsr_net_trained.msgpack"))
    if "loss_hist" in result:
        save_loss_curve(result["loss_hist"][0].tolist(),
                        os.path.join(args.out_dir, "loss.png"),
                        title="GSR-Net fold-0 training loss")
    if result["test_preds"] is not None:
        # the GSR notebook flattens with np.triu_indices (row-major)
        save_prediction(result["test_preds"],
                        os.path.join(args.out_dir, "submission.csv"),
                        ordering="rowmajor")
    print("artifacts in", args.out_dir)


if __name__ == "__main__":
    main()
