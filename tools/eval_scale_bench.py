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


def _device_breakdown(gt, pred):
    """Warm per-family device timings on pre-staged arrays (transfer and
    pivot-sampling excluded; those are reported via the steady headline)."""
    import random
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fcsr_tpu.evalx import report as R

    n = gt.shape[-1]
    with jax.enable_x64(True):
        gt_j = jnp.asarray(gt, dtype=jnp.float64)
        pred_j = jnp.asarray(pred, dtype=jnp.float64)
        rng = random.Random(42)
        piv = jnp.asarray(np.stack([R._sample_pivots(n, min(10, n), rng)
                                    for _ in range(gt.shape[0])]))
        jax.block_until_ready((gt_j, pred_j, piv))
        out = {}
        for label, fn in [
            ("betweenness", lambda: R._run_tiled(R._BC_B, pred_j, piv)),
            ("eigenvector", lambda: R._run_tiled(R._EC_B, pred_j)[0]),
            ("pagerank", lambda: R._run_tiled(R._PR_B, pred_j)[0]),
            ("kcore", lambda: R._run_tiled(R._KC_B, pred_j)),
            ("hist_kl", lambda: R._run_tiled(R._KL_B, gt_j, pred_j)),
        ]:
            jax.block_until_ready(fn())  # warm/compile
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            out[label] = round(time.perf_counter() - t0, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=112)
    ap.add_argument("--out", default=os.path.join("outputs",
                                                  "eval_scale.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (CI smoke)")
    ap.add_argument("--skip-networkx", action="store_true",
                    help="skip the ~7 min host NetworkX pass (iterating "
                         "on the device path)")
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

    # fast path (precision="float32": f32 Brandes, f64 EC/PR — the
    # headline; v5e emulates f64 ~15x slower) and the parity-grade f64
    # path, both timed; metric values quoted from f64
    t0 = time.perf_counter()
    dev32_cold = evaluate_pair_stacks(gt, pred, backend="device",
                                      seed=42, precision="float32")
    t_dev_cold = time.perf_counter() - t0
    steady = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev32 = evaluate_pair_stacks(gt, pred, backend="device",
                                     seed=42, precision="float32")
        steady.append(time.perf_counter() - t0)
    t_dev = min(steady)

    steady64 = []
    dev = dev64_cold = evaluate_pair_stacks(gt, pred, backend="device",
                                            seed=42)
    for _ in range(2):
        t0 = time.perf_counter()
        dev = evaluate_pair_stacks(gt, pred, backend="device", seed=42)
        steady64.append(time.perf_counter() - t0)

    # per-metric device breakdown: each family timed alone on pre-staged
    # device arrays through its individually-jitted kernel (the headline
    # pass runs the FUSED one-dispatch-per-tile program; these isolate
    # where the device compute itself goes)
    breakdown = _device_breakdown(gt, pred)

    if args.skip_networkx:
        nx, t_nx = None, None
    else:
        t0 = time.perf_counter()
        nx = evaluate_pair_stacks(gt, pred, backend="networkx", seed=42)
        t_nx = time.perf_counter() - t0

    line = {
        "metric": f"eval connectomes/sec (full metric suite, "
                  f"{args.n} HR pairs)",
        "value": round(args.n / t_dev, 2),
        "unit": "connectomes/sec",
        "device_steady_s": round(t_dev, 3),
        "device_steady_median_s": round(sorted(steady)[1], 3),
        "device_steady_passes_s": [round(s, 3) for s in steady],
        "device_cold_s": round(t_dev_cold, 3),
        "precision": "float32 fast path (f32 Brandes + f64 EC/PR); "
                     "metric values below from the float64 path",
        "device_f64_steady_s": round(min(steady64), 3),
        "device_f64_passes_s": [round(s, 3) for s in steady64],
        "f32_vs_f64_deltas": {k: float(f"{abs(dev32[k] - dev[k]):.3e}")
                              for k in dev},
        "device_breakdown_s": breakdown,
        "n_pairs": args.n,
        "device_metrics": {k: round(v, 8) for k, v in dev.items()},
        "device": str(jax.devices()[0]),
    }
    if nx is not None:
        deltas = {k: abs(dev[k] - nx[k]) for k in dev}
        line.update({
            "networkx_s": round(t_nx, 3),
            "speedup_vs_networkx": round(t_nx / t_dev, 2),
            "networkx_metrics": {k: round(v, 8) for k, v in nx.items()},
            "backend_deltas": {k: float(f"{v:.3e}")
                               for k, v in deltas.items()},
        })
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(line, f, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
