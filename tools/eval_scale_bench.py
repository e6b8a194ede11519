#!/usr/bin/env python
"""Test-set-scale evaluation-suite benchmark (VERDICT r3 item 7).

Runs the FULL metric suite (BC/EC/PageRank/k-core/hist-KL + MAE/PCC/JSD,
evalx/report.py::evaluate_pair_stacks) over a test-set-sized stack of
112 HR (268x268) connectome pairs on BOTH backends and records wall
clocks + metric agreement in ``outputs/eval_scale.json``:

  * device  — the batched jnp kernels (cold first pass incl. compiles,
    then steady).
  * networkx — the reference's exact host pipeline, once (it has no
    compile phase).

The pair stack is the seeded teacher HR set against a noised copy of
itself (a realistic "prediction": same support, perturbed weights), so
both backends see identical inputs. Metric deltas between backends are
reported; BC uses pivot sampling so backends agree statistically, the
other metrics to float tolerance (bit-parity is separately tested on
small batches in tests/test_eval_metrics.py).

    python tools/eval_scale_bench.py [--n 112] [--out outputs/eval_scale.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=112)
    ap.add_argument("--out", default=os.path.join("outputs",
                                                  "eval_scale.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (CI smoke)")
    args = ap.parse_args()

    from fcsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    if args.cpu or os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms",
                          os.environ.get("JAX_PLATFORMS", "cpu"))
    else:
        from fcsr_tpu.utils.probe import require_live_device
        require_live_device()

    import numpy as np

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.evalx.report import evaluate_pair_stacks

    data = load_or_synthesize(None, n_train=max(args.n, 2), n_test=1,
                              seed=42)
    gt = np.asarray(data["hr_train"][:args.n], dtype=np.float64)
    rng = np.random.default_rng(7)
    noise = rng.normal(0.0, 0.02, size=gt.shape)
    pred = np.clip(gt + (noise + np.swapaxes(noise, 1, 2)) / 2, 0.0, 1.0)
    for m in pred:
        np.fill_diagonal(m, 0.0)

    t0 = time.perf_counter()
    dev_cold = evaluate_pair_stacks(gt, pred, backend="device", seed=42)
    t_dev_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = evaluate_pair_stacks(gt, pred, backend="device", seed=42)
    t_dev = time.perf_counter() - t0

    t0 = time.perf_counter()
    nx = evaluate_pair_stacks(gt, pred, backend="networkx", seed=42)
    t_nx = time.perf_counter() - t0

    deltas = {k: abs(dev[k] - nx[k]) for k in dev}
    line = {
        "metric": f"eval connectomes/sec (full metric suite, "
                  f"{args.n} HR pairs)",
        "value": round(args.n / t_dev, 2),
        "unit": "connectomes/sec",
        "device_steady_s": round(t_dev, 3),
        "device_cold_s": round(t_dev_cold, 3),
        "networkx_s": round(t_nx, 3),
        "speedup_vs_networkx": round(t_nx / t_dev, 2),
        "n_pairs": args.n,
        "device_metrics": {k: round(v, 8) for k, v in dev.items()},
        "networkx_metrics": {k: round(v, 8) for k, v in nx.items()},
        "backend_deltas": {k: float(f"{v:.3e}")
                           for k, v in deltas.items()},
        "device": str(jax.devices()[0]),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(line, f, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
