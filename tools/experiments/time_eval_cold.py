"""Time the official device-metrics path from a fresh process (cold)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from fcsr_tpu.evalx.report import print_metrics

rng = np.random.default_rng(0)
def batch(b, n):
    m = rng.random((b, n, n)).astype(np.float32)
    m = (m + m.transpose(0, 2, 1)) / 2
    for x in m: np.fill_diagonal(x, 0)
    return m

gt, pred = batch(8, 268), batch(8, 268)
t0 = time.perf_counter()
m = print_metrics(gt, pred, fold_i=0, backend="device", write_file=False,
                  verbose=False, seed=1)
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
# different batch size: tiling must NOT recompile
m2 = print_metrics(batch(13, 268), batch(13, 268), fold_i=0,
                   backend="device", write_file=False, verbose=False, seed=1)
t_other = time.perf_counter() - t0
t0 = time.perf_counter()
m3 = print_metrics(gt, pred, fold_i=0, backend="device", write_file=False,
                   verbose=False, seed=1)
t_steady = time.perf_counter() - t0
print(f"cold_first_metrics_s={t_cold:.1f} other_batchsize_s={t_other:.1f} steady_s={t_steady:.1f}")
print({k: round(v, 5) for k, v in m.items()})
