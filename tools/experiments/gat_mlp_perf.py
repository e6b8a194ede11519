"""Measure the fold-parallel GAT and MLP CV wall clocks at the full
reference workload sizes (VERDICT r2 item 2; numbers go into PERF.md).

GAT: 3 folds x 100 epochs, 160->268, dim 16, per-sample updates
(ref workload: unet-transformer.py:478-541). Round-1 sequential baseline:
634 s. Target: <120 s via train_gat_folds_parallel.

MLP: 3-fold SpectralResMLP CV (ref: training_template.ipynb), steady
per-run wall clock.

Run twice per family (cold incl. compiles, steady warm) on the TPU.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.pipelines import run_gat_cv_fast, run_mlp_cv

data = load_or_synthesize("data", n_train=167, n_test=112, seed=42)
which = sys.argv[1] if len(sys.argv) > 1 else "both"

if which in ("gat", "both"):
    for label in ("cold", "steady"):
        t0 = time.perf_counter()
        res = run_gat_cv_fast(data, splits=3, seed=42)
        t = time.perf_counter() - t0
        print(f"GAT fold-parallel 3x100ep {label}: {t:.1f}s "
              f"train={res['timings']['train']:.1f}s "
              f"fold_maes={[round(m, 5) for m in res['fold_maes']]}",
              flush=True)

if which in ("mlp", "both"):
    for label in ("cold", "steady"):
        t0 = time.perf_counter()
        res = run_mlp_cv(data, k_folds=3, num_epochs=100)
        t = time.perf_counter() - t0
        print(f"MLP v2 3-fold 100ep {label}: {t:.1f}s", flush=True)
