#!/usr/bin/env python
"""Per-family benchmark artifacts: GAT U-Net and MLP v2 full-size CV
runs, emitted in the same one-JSON-line schema as bench.py so the
PERF.md family numbers are driver-checkable artifacts rather than
prose.

    python tools/family_bench.py --family gat   # outputs/gat/bench.json
    python tools/family_bench.py --family mlp   # outputs/mlp/bench.json

Workloads (full reference configs on the seeded synthetic teacher
dataset, 167 subjects, 160->268; real CSVs are used when present in
FCSR_DATA_DIR — same substitution rule as bench.py):

  * gat — ``run_gat_cv_fast`` 3-fold x 100 epochs, fused whole-step
    kernel, on-device control (ref: unet-transformer.py:478-541).
  * mlp — ``run_mlp_cv`` (SpectralResMLP v2) 3-fold x 100 epochs,
    on-device control (ref: training_template.ipynb).

``vs_baseline`` means the SAME thing here as in bench.py (unified in
round 4): speedup vs the 60 s north-star budget scaled to this
workload's work-item count — the GSR north star is 60 s for 66 967
work items (66 800 train steps + 167 eval forwards), i.e. a budget of
60/66 967 s per connectome, so ``vs_baseline = work * (60/66967) /
elapsed``. The historical round-2 steady comparison (GAT 43.9 s, MLP
297 s for their recorded workloads) is kept as ``vs_round2`` — the
value that must stay >= 1.0 to not regress within-family.

Phase definitions (PERF.md "cold" reconciliation, round 5):

  * ``cold_s`` — the IN-PROCESS first pass: host tracing + client
    compile (or persistent-cache deserialize) + the tunnelled server's
    per-process program load + host precompute (SVD/spectral, unless
    disk-cached) + staging + init + one full workload execution.
  * ``elapsed_s`` / ``steady_passes_s`` — warm passes in the same
    process (programs loaded, host precompute memoized, staging
    content-cached): the steady state of the program itself. The JSON
    line reports the min; ``elapsed_median_s`` the median. The
    tunnelled runtime's per-dispatch latency jitters 2-3x
    minute-to-minute (PERF.md "tunnel-weather measurement"), so min is
    the reproducible program property, median the typical draw.
  * ``first_run_s`` (``--first-runs N``) — FRESH-PROCESS one-shot runs
    with warm DISK caches (persistent XLA compile cache + host
    precompute npz cache populated, in-process memos gone): the wall
    clock a user pays for ``run_*_cv_fast`` the first time in a new
    Python process — the reference's own usage shape. Measured by
    spawning subprocesses AFTER the in-process passes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Round-2 recorded steady numbers (PERF.md "Other model families") and
# the work-item counts of the workloads they were measured on — used to
# scale vs_baseline when --splits/--epochs select a different workload
# (a fixed-baseline division would inflate the "speedup" ~10x for
# --epochs 10).
R2_STEADY = {"gat": 43.9, "mlp": 297.0}
R2_WORK = {"gat": 13304, "mlp": 33455}

# The unified vs_baseline denominator (see module docstring): the GSR
# north star grants 60 s for 66 967 work items; every perf JSON in this
# repo reports speedup against that same per-work-item budget.
NORTH_STAR_S_PER_ITEM = 60.0 / 66967.0


def _data():
    from fcsr_tpu.data import has_real_csvs, load_or_synthesize
    data_dir = os.environ.get("FCSR_DATA_DIR", "data")
    is_synthetic = not has_real_csvs(data_dir)
    return load_or_synthesize(data_dir, n_train=167, n_test=112,
                              seed=42), is_synthetic


def run_gat(data, splits, epochs, fused, unroll=None):
    from fcsr_tpu.pipelines import run_gat_cv_fast
    from fcsr_tpu.train.gat_loop import GATTrainConfig

    kw = {} if unroll is None else {"scan_unroll": unroll}
    cfg = GATTrainConfig(epochs=epochs, fused_step=fused, **kw)
    res = run_gat_cv_fast(data, cfg=cfg, splits=splits, seed=42)
    epochs_run = sum(len(h["train"]) for h in res["histories"])
    n = len(data["lr_train"])
    per_epoch_steps = sum(n - (n // splits + (1 if j < n % splits else 0))
                          for j in range(splits)) / splits
    steps = int(epochs_run * per_epoch_steps)
    evals = n  # every subject appears in exactly one fold's val pass
    return res["mean_mae"], steps + evals


def run_mlp(data, splits, epochs):
    from fcsr_tpu.data.datamodule import contiguous_window_folds
    from fcsr_tpu.pipelines import run_mlp_cv

    res = run_mlp_cv(data, k_folds=splits, num_epochs=epochs, seed=42)
    # work items from the ACTUAL fold plan (contiguous windows with
    # p_val=0.33 — train size is n - int(0.33 n) regardless of splits,
    # NOT n(1 - 1/splits)) and the epochs each fold actually ran
    folds = contiguous_window_folds(len(data["lr_train"]), splits, 0.33,
                                    seed=42)
    steps = sum(len(tr_h) * len(tr)
                for (tr_h, _, _), (tr, _) in zip(res["histories"], folds))
    evals = sum(len(va) for _, va in folds)
    return res["mean_mae"], steps + evals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=["gat", "mlp"])
    ap.add_argument("--splits", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--no-fused", action="store_true",
                    help="(gat) op-graph steps instead of the fused "
                         "whole-step kernel")
    ap.add_argument("--unroll", type=int, default=None,
                    help="(gat) scan_unroll override — the cold-profile "
                         "experiment: 1 halves the chunk program and its "
                         "per-process server-side load at ~2x the "
                         "marginal epoch cost (PERF.md GAT cold-start)")
    ap.add_argument("--steady-passes", type=int, default=3,
                    help="warm passes to run; the reported steady time "
                         "is their min (link-weather robustness, see "
                         "module docstring)")
    ap.add_argument("--first-runs", type=int, default=0,
                    help="fresh-process one-shot passes to run AFTER the "
                         "in-process passes (warm disk caches); recorded "
                         "as first_run_passes_s / first_run_s (median)")
    ap.add_argument("--one-pass", action="store_true",
                    help="internal: run exactly one pass and print its "
                         "elapsed seconds (the --first-runs subprocess)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from fcsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    # JAX_PLATFORMS via the config route (the TPU plugin ignores the env
    # var) — same shim as bench.py / the CLI
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # dead-tunnel fail-fast (see utils/probe.py)
    from fcsr_tpu.utils.probe import require_live_device
    require_live_device()

    data, is_synthetic = _data()

    def one_pass():
        t0 = time.perf_counter()
        if args.family == "gat":
            mae, work = run_gat(data, args.splits, args.epochs,
                                fused=not args.no_fused,
                                unroll=args.unroll)
        else:
            mae, work = run_mlp(data, args.splits, args.epochs)
        return time.perf_counter() - t0, mae, work

    if args.one_pass:
        t, mae, work = one_pass()
        print(json.dumps({"one_pass_s": round(t, 3),
                          "mean_val_mae": round(mae, 6), "work": work}))
        return

    t_cold, _, _ = one_pass()
    steadies = []
    for _ in range(max(1, args.steady_passes)):
        t_steady, mae, work = one_pass()
        steadies.append(t_steady)
    t_steady = min(steadies)

    first_runs = []
    if args.first_runs:
        import subprocess
        cmd = [sys.executable, os.path.abspath(__file__),
               "--family", args.family, "--splits", str(args.splits),
               "--epochs", str(args.epochs), "--one-pass"]
        if args.no_fused:
            cmd.append("--no-fused")
        if args.unroll is not None:
            cmd += ["--unroll", str(args.unroll)]
        for i in range(args.first_runs):
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            first_runs.append(rec["one_pass_s"])
            print(f"first_run {i}: {rec['one_pass_s']} s", file=sys.stderr)

    # unified vs_baseline: the 60 s north-star budget scaled to this
    # run's work items (same denominator semantics as bench.py); the
    # round-2 within-family steady number stays as vs_round2, scaled to
    # this workload so it remains "speedup on the same workload" under
    # --splits/--epochs
    r2_s = R2_STEADY[args.family] * work / R2_WORK[args.family]
    line = {
        "metric": f"connectomes/sec ({args.family} family, "
                  f"{args.splits}-fold x {args.epochs}ep train+infer)",
        "value": round(work / t_steady, 2),
        "unit": "connectomes/sec",
        "vs_baseline": round(work * NORTH_STAR_S_PER_ITEM / t_steady, 3),
        "baseline": "60 s north-star budget scaled per work item "
                    "(60/66967 s per connectome; same semantics as "
                    "bench.py vs_baseline)",
        "vs_round2": round(r2_s / t_steady, 3),
        "round2_baseline": f"round-2 steady {R2_STEADY[args.family]} s "
                           f"for {R2_WORK[args.family]} work items "
                           "(PERF.md), scaled to this workload",
        "elapsed_s": round(t_steady, 3),
        "elapsed_median_s": round(sorted(steadies)[len(steadies) // 2], 3),
        "steady_passes_s": [round(s, 3) for s in steadies],
        "cold_s": round(t_cold, 3),
        "splits": args.splits,
        "epochs": args.epochs,
        "work_items": work,
        "is_synthetic": is_synthetic,
        "mean_val_mae": round(mae, 6),
        "device": str(jax.devices()[0]),
    }
    if first_runs:
        line["first_run_s"] = sorted(first_runs)[len(first_runs) // 2]
        line["first_run_passes_s"] = first_runs
    out = args.out or os.path.join("outputs", args.family, "bench.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(line, f, indent=1)
        f.write("\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
