#!/usr/bin/env python
"""Driver benchmark: full 3-fold GSR-Net train+eval throughput.

North star (BASELINE.md): full 3-fold GSR-Net train+eval under 60 s on one
v5e chip. Metric: connectomes/sec processed across the whole pipeline
(training steps + eval forwards). ``vs_baseline`` is the speedup vs the
north-star 60 s budget for the same workload.

Measurement protocol
--------------------
The dataset is staged to HBM once. The 200-epoch run executes as FOUR
launches of ONE 50-epoch program (trajectory-identical to single-shot —
tests/test_checkpoint_resume.py; the state stays device-resident between
launches). Both timed passes run this SAME program:

  * cold pass  — first execution: pays the program's one XLA/server
    compile. It also persists exact-resume checkpoints between chunks, so
    a bench process killed mid-run (tunnel stall, OOM) resumes instead of
    restarting; stale checkpoints from other configs are fingerprinted
    and discarded.
  * steady pass — same program, fully warm; this is the reported number.

Quality gates (per-gate results are separate JSON fields):

  * synthetic data (no data/lr_train.csv): (a) trained val MAE < 0.5 x
    untrained-model val MAE (broken-training canary) and (b) a pinned
    golden band |MAE - golden| < 15% (shape-preserving-math-bug canary;
    a deliberate mutation is demonstrated to blow past it in
    tests/test_bench_quality.py). The golden is hardware/precision
    pinned: it was measured on GOLDEN_DEVICE; on any other device kind
    the band is reported but NOT asserted (golden_device_mismatch=true).
  * real Kaggle CSVs: gate on proximity to the published reference
    quality instead — |MAE - 0.14584| <= 1e-3 (BASELINE.md GSR-Net mean;
    the actual north-star criterion). The untrained-factor gate is not
    applied (at reference-level quality the ratio is ~0.55 by design —
    see PERF.md "Why a trained GSR-Net cannot beat a train-mean
    predictor").

Re-pinning the golden: when a change INTENDS to move the trajectory
(model math, optimizer, teacher dataset, precision policy) run
``python bench.py`` on the pinned device, take ``mean_val_mae`` from the
JSON line, update GOLDEN_MAE below (and GOLDEN_DEVICE if the hardware
moved), and say so in the commit message. FCSR_BENCH_GOLDEN_MAE
overrides per-run without re-pinning.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# In-kernel matmul mode for the fused Pallas kernels (core/mosaic_mm.py,
# read at import): the bench runs single-pass bf16 MXU products — 23%
# faster end-to-end (7.41 s vs 9.11 s steady) with val MAE 4e-4-of-golden
# INSIDE the pinned quality band (0.038157 vs golden 0.038172; measured,
# PERF.md "in-kernel precision"). The library default stays the
# f32-class compensated mode (bf16x3_concat) for parity-grade
# trajectories; FCSR_MM_MODE=bf16x3_concat reproduces it here. The
# quality gates below guard this choice on every run.
os.environ.setdefault("FCSR_MM_MODE", "bf16")

# Golden val-MAE for the shipped config on the seeded teacher dataset
# (3 folds, 200 epochs, fused kernels, f32) — measured on GOLDEN_DEVICE
# in round 2 (BENCH_r02). See module docstring for the re-pin procedure.
GOLDEN_MAE = 0.038172
GOLDEN_DEVICE = "TPU v5 lite"
# Published reference quality (BASELINE.md, GSR-Net 3-fold mean MAE) and
# the north-star parity budget — the real-data gate.
REFERENCE_MAE = 0.14584
REFERENCE_TOL = 1e-3


def quality_gates(mean_mae, untrained_mae, *, is_synthetic, splits,
                  device_kind, env=None):
    """Compute the bench quality gates. Returns (fields dict, ok bool).

    Pure host-side logic (no jax) so tests can exercise both dataset
    branches directly (tests/test_bench_quality.py).
    """
    env = os.environ if env is None else env
    fields = {
        "mean_val_mae": round(float(mean_mae), 6),
        "untrained_val_mae": round(float(untrained_mae), 6),
    }
    if not is_synthetic:
        ref = float(env.get("FCSR_BENCH_REF_MAE", str(REFERENCE_MAE)))
        tol = float(env.get("FCSR_BENCH_REF_TOL", str(REFERENCE_TOL)))
        ok = abs(mean_mae - ref) <= tol
        fields.update(reference_mae=ref,
                      gate_reference_mae=bool(ok))
        return fields, bool(ok)

    gate_trained = bool(mean_mae < 0.5 * untrained_mae)
    fields["gate_trained_vs_untrained"] = gate_trained
    ok = gate_trained
    golden = float(env.get("FCSR_BENCH_GOLDEN_MAE", str(GOLDEN_MAE)))
    # the pinned golden is only meaningful for the seeded teacher dataset
    # at the default 3-fold config, on the device it was measured on
    if golden > 0 and splits == 3:
        in_band = bool(abs(mean_mae - golden) < 0.15 * golden)
        fields["golden_mae"] = golden
        fields["gate_golden_band"] = in_band
        if GOLDEN_DEVICE in str(device_kind):
            ok = ok and in_band
        else:
            # different hardware legitimately moves the f32 trajectory:
            # report, don't assert (see module docstring)
            fields["golden_device_mismatch"] = True
    return fields, bool(ok)


def main():
    from fcsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # here via the config route so the CI smoke (and any user) can force
    # a backend for this process
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # fail diagnosably when the tunnelled device is stalled (observed:
    # multi-hour outages) instead of hanging into the caller's opaque
    # timeout. The bench default waits up to 10 min (round 3's capture
    # was lost to a stall that a patient wait could have outlived);
    # FCSR_BENCH_PROBE_TIMEOUT overrides for fail-fast interactive use.
    os.environ.setdefault("FCSR_BENCH_PROBE_TIMEOUT", "600")
    from fcsr_tpu.utils.probe import require_live_device
    require_live_device()

    import numpy as np

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train import GSRTrainConfig
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    from fcsr_tpu.data import has_real_csvs
    data_dir = os.environ.get("FCSR_DATA_DIR", "data")
    is_synthetic = not has_real_csvs(data_dir)

    # FCSR_BENCH_TINY=1: CI smoke mode — the FULL protocol (staging,
    # chunked cold pass with exact-resume checkpoints, steady pass,
    # gates, the one-JSON-line contract) at toy scale (9 subjects,
    # 20->32 nodes), runnable on CPU in seconds. Guards the late code
    # path end-to-end (tests/test_bench_quality.py::
    # test_bench_main_smoke_tiny); the golden band does not apply at
    # this scale (pinned for the full config only).
    tiny = os.environ.get("FCSR_BENCH_TINY") == "1"
    if tiny:
        os.environ.setdefault("FCSR_BENCH_GOLDEN_MAE", "0")
        if is_synthetic:
            data = load_or_synthesize(None, n_train=9, n_test=1, seed=42)
            data = dict(data,
                        lr_train=data["lr_train"][:, :20, :20].copy(),
                        hr_train=data["hr_train"][:, :32, :32].copy())
        else:
            # tiny + CSVs on disk: the REAL-DATA branch end-to-end
            # (native parser -> anti-vectorize -> reference-MAE gate) at
            # whatever resolution the CSVs carry — CI runs this on
            # reduced-size Kaggle-schema files
            # (tests/test_bench_quality.py)
            from fcsr_tpu.data import load_dataset
            data = load_dataset(data_dir)
    else:
        data = load_or_synthesize(data_dir, n_train=167, n_test=112,
                                  seed=42)

    # reference config (200 epochs, lr 1e-4) with the WHOLE training step
    # — U-Net fwd + spectral tail value+grad + hand-written U-Net
    # adjoints + the masked Adam update — as ONE Mosaic kernel
    # (models/fused_step.py::train_step_fused; bit-exact vs the
    # three-kernel path, tested). Eliminating the flat-Adam marshalling
    # is worth ~115 us/step: 7.28 -> 4.72 s steady (PERF.md).
    if tiny:
        lr_dim = int(data["lr_train"].shape[-1])
        hr_dim = int(data["hr_train"].shape[-1])
        cfg = GSRTrainConfig(fused_adam=True, lr_dim=lr_dim,
                             hr_dim=hr_dim, hidden_dim=hr_dim,
                             ks=(0.9, 0.7))
    else:
        cfg = GSRTrainConfig(fused_adam=True)
    if os.environ.get("FCSR_BENCH_EPOCHS"):
        import dataclasses
        cfg = dataclasses.replace(
            cfg, epochs=int(os.environ["FCSR_BENCH_EPOCHS"]))
    splits = int(os.environ.get("FCSR_BENCH_SPLITS", "3"))
    n = len(data["lr_train"])
    folds = kfold_indices(n, splits, seed=42)
    chunk = max(1, cfg.epochs // 4)  # ONE 50-epoch program, launched 4x

    t0 = time.perf_counter()
    runner = GSRFoldRunner(cfg, data["lr_train"], data["hr_train"], folds)
    t_stage = time.perf_counter() - t0

    # quality sensitivity: the UNTRAINED models' val MAE (same inits) is
    # the broken-training canary (also warms the eval program so both
    # timed passes below see identical compile state)
    untrained_maes, _ = runner.evaluate(runner.flat0)
    untrained_mae = float(np.asarray(untrained_maes).mean())

    def full_pass(checkpoint=None):
        t0 = time.perf_counter()
        if checkpoint is not None:
            runner.train(checkpoint_path=checkpoint,
                         checkpoint_every=chunk)
        else:
            runner.train(chunk_epochs=chunk)
        maes, _ = runner.evaluate()
        maes = np.asarray(maes)  # force sync
        return time.perf_counter() - t0, maes

    # cold: first execution of the shared chunked program (+ exact-resume
    # checkpoints for mid-run crash resilience); steady: same program warm
    ck = os.environ.get("FCSR_BENCH_CHECKPOINT",
                        os.path.join("outputs", "bench_checkpoint.msgpack"))
    os.makedirs(os.path.dirname(ck) or ".", exist_ok=True)
    t_cold, _ = full_pass(checkpoint=ck)
    if os.path.exists(ck):
        os.remove(ck)
    t_steady, maes = full_pass()

    # quality context: MAE of predicting each fold's train-mean HR matrix
    # (with unit diagonal, matching the eval convention)
    hr = np.asarray(data["hr_train"], dtype=np.float32)
    base = []
    for tr, va in folds:
        mean_hr = hr[tr].mean(axis=0)
        np.fill_diagonal(mean_hr, 1.0)
        gts = hr[va].copy()
        for m in gts:
            np.fill_diagonal(m, 1.0)
        base.append(np.abs(gts - mean_hr[None]).mean())
    baseline_mae = float(np.mean(base))

    device = str(jax.devices()[0])
    quality, quality_ok = quality_gates(
        float(maes.mean()), untrained_mae, is_synthetic=is_synthetic,
        splits=splits, device_kind=device)
    quality["trainmean_baseline_mae"] = round(baseline_mae, 6)

    n_train_steps = sum(len(tr) for tr, _ in folds) * cfg.epochs
    n_eval = sum(len(va) for _, va in folds)
    work = n_train_steps + n_eval
    rate = work / t_steady
    out = {
        "metric": "connectomes/sec (160->268 upsample) train+infer",
        "value": round(rate, 2),
        "unit": "connectomes/sec",
        "vs_baseline": round(rate / (work / 60.0), 3),
        "baseline": "60 s north-star budget for this workload "
                    "(BASELINE.md; same per-work-item semantics as "
                    "tools/family_bench.py)",
        "elapsed_s": round(t_steady, 3),
        "cold_s": round(t_cold, 3),
        "stage_s": round(t_stage, 3),
        "splits": splits,
        "epochs": cfg.epochs,
        "chunk_epochs": chunk,
        "train_steps": n_train_steps,
        "is_synthetic": is_synthetic,
        **quality,
        "quality_ok": bool(quality_ok),
        "device": device,
    }
    print(json.dumps(out))
    if not quality_ok:
        # explicit exit, not assert: `python -O` strips asserts and
        # would let a real quality regression return 0
        raise SystemExit(
            "quality regression: trained val MAE failed the sensitivity "
            f"gates ({quality})")


if __name__ == "__main__":
    main()
