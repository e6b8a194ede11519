#!/usr/bin/env python
"""Emit the seeded teacher dataset as Kaggle-schema CSVs.

Writes ``lr_train.csv`` / ``hr_train.csv`` / ``lr_test.csv`` (leading
1-based ID column, row-major strict-upper-triangle values, deterministic
NaN sprinkle — the exact shape the reference ingests, ref:
utils/preprocessing.py:35-75) so the real-CSV branch of every entry
point (native C++ parser, batched anti-vectorize, bench.py's
reference-MAE quality gate) can be exercised end-to-end before the
private challenge data is available.

    python tools/make_teacher_csvs.py --out /tmp/kaggle_csvs
    FCSR_DATA_DIR=/tmp/kaggle_csvs FCSR_BENCH_REF_MAE=<pinned> python bench.py

NOTE: after loading, the sprinkled NaN cells become 0 (the dataset
preprocessing rule), so the loaded arrays differ from the in-memory
teacher set at ~nan_frac of the off-diagonal entries; re-pin the gate
value (FCSR_BENCH_REF_MAE) on the loaded data, not the teacher npz.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=167)
    ap.add_argument("--n-test", type=int, default=112)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--nan-frac", type=float, default=0.001)
    ap.add_argument("--tiny", action="store_true",
                    help="reduced-size set (9 subjects, 20->32 nodes) "
                         "for CI")
    args = ap.parse_args()

    # pure host-side work — never touch the (possibly stalled) TPU
    # tunnel; the axon plugin ignores the env var, so use the config
    # route (same shim as bench.py)
    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("JAX_PLATFORMS", "cpu"))

    from fcsr_tpu.data import load_or_synthesize, write_kaggle_csvs

    if args.tiny:
        data = load_or_synthesize(None, n_train=9, n_test=2,
                                  seed=args.seed)
        data = dict(data,
                    lr_train=data["lr_train"][:, :20, :20].copy(),
                    hr_train=data["hr_train"][:, :32, :32].copy(),
                    lr_test=data["lr_test"][:, :20, :20].copy())
    else:
        data = load_or_synthesize(None, n_train=args.n_train,
                                  n_test=args.n_test, seed=args.seed)
    write_kaggle_csvs(data, args.out, nan_frac=args.nan_frac,
                      seed=args.seed)
    for name in ("lr_train.csv", "hr_train.csv", "lr_test.csv"):
        p = os.path.join(args.out, name)
        print(f"{p}: {os.path.getsize(p)} bytes")


if __name__ == "__main__":
    main()
