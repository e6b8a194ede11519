"""Command-line interface.

The reference has no CLI (entry points are notebooks and one script
``__main__``, ref: SURVEY §3); this consolidates them:

    python -m fcsr_tpu train gsr  --data-dir data --splits 5
    python -m fcsr_tpu train mlp  --data-dir data --k-folds 3
    python -m fcsr_tpu train gat  --data-dir data --splits 3
    python -m fcsr_tpu evaluate   --gt gt.npz --pred pred.npz --fold 0
    python -m fcsr_tpu predict    --params params.msgpack --out sub.csv
    python -m fcsr_tpu submit     --csv submission.csv -m "message"

Synthetic data is substituted automatically when the Kaggle CSVs are not
present in --data-dir (the challenge data is private).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

__all__ = ["main"]


def _add_common(p):
    p.add_argument("--data-dir", default="data")
    p.add_argument("--out-dir", default="outputs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--full-metrics", action="store_true")
    p.add_argument("--eval-backend", default="device",
                   choices=["device", "networkx"])
    p.add_argument("--verbose", action="store_true")


def build_parser():
    ap = argparse.ArgumentParser(prog="fcsr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train", help="train a model family with CV")
    trs = tr.add_subparsers(dest="family", required=True)

    g = trs.add_parser("gsr")
    _add_common(g)
    g.add_argument("--splits", type=int, default=5)
    g.add_argument("--epochs", type=int, default=200)
    g.add_argument("--lr", type=float, default=1e-4)
    g.add_argument("--lmbda", type=float, default=16.0)
    g.add_argument("--multichip", action="store_true",
                   help="shard the fold axis of the fast trainer over all "
                        "local devices (implies --fast; per-fold math "
                        "identical to single-device)")
    g.add_argument("--fast", action="store_true",
                   help="fold-parallel clean-CV trainer")
    g.add_argument("--reset-per-fold", action="store_true",
                   help="fresh model per fold (the reference keeps "
                        "training one model across folds)")
    g.add_argument("--checkpoint", default=None,
                   help="(--fast only) checkpoint file for exact "
                        "mid-training save/resume")
    g.add_argument("--checkpoint-every", type=int, default=None)
    g.add_argument("--fused-tail", action="store_true",
                   help="run the spectral-layer+decoder+loss segment as "
                        "one fused Pallas kernel (TPU; identical math)")
    g.add_argument("--fused", action="store_true",
                   help="run the ENTIRE training step (forward, backward "
                        "and Adam) as one Pallas kernel — the fastest "
                        "measured path (PERF.md; implies --fast; math "
                        "identical to the unfused trainer up to float "
                        "reassociation; on CPU it falls back to the slow "
                        "kernel interpreter, so use on TPU)")

    m = trs.add_parser("mlp")
    _add_common(m)
    m.add_argument("--k-folds", type=int, default=3)
    m.add_argument("--p-val", type=float, default=0.33)
    m.add_argument("--epochs", type=int, default=100)
    m.add_argument("--lr", type=float, default=0.01)
    m.add_argument("--n-layers", type=int, default=0)
    m.add_argument("--batch-size", type=int, default=32)
    m.add_argument("--variant", default="v2", choices=["v1", "v2"])

    a = trs.add_parser("gat")
    _add_common(a)
    a.add_argument("--fast", action="store_true",
                   help="fold-parallel trainer (all folds in one vmapped "
                        "program; see train/gat_loop.py)")
    a.add_argument("--fused", action="store_true",
                   help="run each GAT training step (fwd, bwd and AdamW) "
                        "as one Pallas kernel (implies --fast; TPU — on "
                        "CPU falls back to the slow kernel interpreter)")
    a.add_argument("--multichip", action="store_true",
                   help="shard the fold axis of the fold-parallel trainer "
                        "over all local devices (implies --fast; "
                        "zero-collective layout like the GSR trainer)")
    a.add_argument("--splits", type=int, default=3)
    a.add_argument("--epochs", type=int, default=100)
    a.add_argument("--lr", type=float, default=1e-3)
    a.add_argument("--dim", type=int, default=16)

    ev = sub.add_parser("evaluate", help="run the metric suite on npz stacks")
    ev.add_argument("--gt", required=True)
    ev.add_argument("--pred", required=True)
    ev.add_argument("--fold", type=int, default=0)
    ev.add_argument("--backend", default="device",
                    choices=["device", "networkx"])
    ev.add_argument("--out-dir", default=".")

    pr = sub.add_parser("predict",
                        help="load a GSR checkpoint and write a submission")
    pr.add_argument("--params", required=True,
                    help="msgpack params file (as written by the "
                         "train pipelines / examples)")
    pr.add_argument("--data-dir", default="data")
    pr.add_argument("--out", default="submission.csv")
    pr.add_argument("--ordering", default="rowmajor",
                    choices=["rowmajor", "colmajor"])
    pr.add_argument("--seed", type=int, default=42)

    from fcsr_tpu.iox.submission import DEFAULT_COMPETITION
    sm = sub.add_parser("submit",
                        help="submit a written CSV to the Kaggle challenge "
                             "(ref: training_gsr.ipynb cell-9)")
    sm.add_argument("--csv", default="submission.csv")
    sm.add_argument("--message", "-m", default="fcsr_tpu submission")
    sm.add_argument("--competition", default=DEFAULT_COMPETITION)
    sm.add_argument("--dry-run", action="store_true",
                    help="print the kaggle CLI command instead of running it")

    return ap


def _load_data(args):
    from fcsr_tpu.data import load_or_synthesize
    return load_or_synthesize(args.data_dir, seed=args.seed)


def _finish(args, result, submission_name, ordering="colmajor"):
    os.makedirs(args.out_dir, exist_ok=True)
    if result.get("test_preds") is not None:
        from fcsr_tpu.iox import save_prediction
        path = os.path.join(args.out_dir, submission_name)
        save_prediction(result["test_preds"], path, ordering=ordering)
        print(f"submission written: {path}")
    if result.get("fold_metrics"):
        path = os.path.join(args.out_dir, "eval_metrics.json")
        with open(path, "w") as f:
            json.dump(result["fold_metrics"], f, indent=2)
        print(f"metrics written: {path}")


def main(argv=None):
    args = build_parser().parse_args(argv)

    # AOT-persist compiled programs across processes: first-ever compiles
    # are slow on the TPU compile service (utils/compile_cache.py), every
    # later cold start reuses them from disk.
    from fcsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    # honor JAX_PLATFORMS via the config route — the axon TPU plugin
    # ignores the env var, so `JAX_PLATFORMS=cpu python -m fcsr_tpu ...`
    # would silently run on TPU anyway (bench.py/__graft_entry__ apply
    # the same shim)
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if args.cmd == "train":
        from fcsr_tpu.utils import set_seed
        set_seed(args.seed)
        data = _load_data(args)
        if args.family == "gsr":
            from fcsr_tpu.pipelines import run_gsr_cv, run_gsr_cv_fast
            from fcsr_tpu.train import GSRTrainConfig
            cfg = GSRTrainConfig(epochs=args.epochs, lr=args.lr,
                                 lmbda=args.lmbda,
                                 fused_tail=args.fused_tail,
                                 fused_adam=args.fused)
            if args.fast or args.multichip or args.fused:
                if args.verbose:
                    # no silent flag drop: the fast path runs as one
                    # compiled program — there is no per-epoch host
                    # loop to narrate
                    print("note: --verbose has no per-epoch output on "
                          "the fast/fused path (whole-run on-device "
                          "control; epoch histories are in the result)",
                          file=sys.stderr)
                result = run_gsr_cv_fast(
                    data, cfg, splits=args.splits, seed=args.seed,
                    full_metrics=args.full_metrics,
                    eval_backend=args.eval_backend,
                    checkpoint_path=args.checkpoint,
                    checkpoint_every=args.checkpoint_every,
                    multichip=args.multichip)
            else:
                result = run_gsr_cv(data, cfg, splits=args.splits,
                                    seed=args.seed,
                                    reset_per_fold=args.reset_per_fold,
                                    full_metrics=args.full_metrics,
                                    eval_backend=args.eval_backend,
                                    verbose=args.verbose)
            print(json.dumps({"fold_maes": result["fold_maes"],
                              "mean_mae": result["mean_mae"],
                              "timings": result["timings"]}))
            # the GSR notebook emits the row-major submission ordering
            _finish(args, result, "submission.csv", ordering="rowmajor")
        elif args.family == "mlp":
            from fcsr_tpu.pipelines import run_mlp_cv
            result = run_mlp_cv(data, k_folds=args.k_folds,
                                p_val=args.p_val, num_epochs=args.epochs,
                                lr=args.lr, batch_size=args.batch_size,
                                n_layers=args.n_layers, seed=args.seed,
                                variant=args.variant,
                                full_metrics=args.full_metrics,
                                eval_backend=args.eval_backend,
                                verbose=args.verbose)
            _finish(args, result, "submission.csv", ordering="colmajor")
        elif args.family == "gat":
            from fcsr_tpu.pipelines import run_gat_cv, run_gat_cv_fast
            from fcsr_tpu.train.gat_loop import GATTrainConfig
            cfg = GATTrainConfig(epochs=args.epochs, lr=args.lr,
                                 dim=args.dim, fused_step=args.fused)
            if args.fast or args.fused or args.multichip:
                result = run_gat_cv_fast(
                    data, splits=args.splits, seed=args.seed, cfg=cfg,
                    full_metrics=args.full_metrics,
                    eval_backend=args.eval_backend, verbose=args.verbose,
                    multichip=args.multichip)
            else:
                result = run_gat_cv(data, splits=args.splits,
                                    seed=args.seed, cfg=cfg,
                                    full_metrics=args.full_metrics,
                                    eval_backend=args.eval_backend,
                                    verbose=args.verbose)
            _finish(args, result, "submission.csv", ordering="colmajor")
        return 0

    if args.cmd == "predict":
        import jax

        from fcsr_tpu.data import load_or_synthesize
        from fcsr_tpu.iox import load_pytree, save_prediction
        from fcsr_tpu.train import GSRTrainConfig, init_gsr, predict_gsr

        cfg = GSRTrainConfig()
        model, template, _, _ = init_gsr(cfg, jax.random.PRNGKey(0))
        params = load_pytree(template, args.params)
        data = load_or_synthesize(args.data_dir, seed=args.seed)
        preds = np.asarray(predict_gsr(params, model, cfg,
                                       data["lr_test"]))
        save_prediction(preds, args.out, ordering=args.ordering)
        print(f"submission written: {args.out} "
              f"({preds.shape[0]} subjects, {args.ordering})")
        return 0

    if args.cmd == "submit":
        from fcsr_tpu.iox.submission import kaggle_submit
        if not os.path.exists(args.csv):
            print(f"no such file: {args.csv}", file=sys.stderr)
            return 2
        return kaggle_submit(args.csv, args.message,
                             competition=args.competition,
                             dry_run=args.dry_run)

    if args.cmd == "evaluate":
        from fcsr_tpu.evalx.report import print_metrics

        def load_stack(path):
            if path.endswith(".npz"):
                with np.load(path) as z:
                    return z[z.files[0]]
            return np.load(path)

        print_metrics(load_stack(args.gt), load_stack(args.pred),
                      fold_i=args.fold, backend=args.backend,
                      out_dir=args.out_dir)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
