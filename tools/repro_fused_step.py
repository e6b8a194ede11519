#!/usr/bin/env python
"""Minimal repro for the whole-step Mosaic kernel compile-service crash.

The gather-free rank-select formulation of the FULL GSR-Net training step
(U-Net + spectral layer + decoder + all losses, forward AND grad in one
kernel — models/fused_step.py::step_value_and_grad_fused) is bit-exact vs
the XLA path in interpret mode and under XLA execution (tested), but the
joint kernel has crashed the v5e TPU compile service with HTTP 500 (no
diagnostics) on every toolchain so far. Re-run this each round; if it
starts compiling, wire cfg.fused_step into the trainer and re-bench.

History:
  2026-08 r1/r2: HTTP 500 from the compile service (full dims and
  reduced dims); U-Net forward-only kernel + tail kernel compile fine.
  2026-08 r3: RESOLVED. The current toolchain surfaces the real cause —
  a scoped-VMEM overflow (19.37 MB vs the default 16 MB budget). With
  CompilerParams(vmem_limit_bytes=112MB) the kernel COMPILED+RAN:
  "COMPILED+RAN in 489.7s: loss=2.290715 (want 2.290715)
   max_grad_diff=1.68e-08" (v5e, 2026-08-17). The ~8-minute compile
  (vs seconds for the hand-written-adjoint kernels) keeps it a
  validation artifact; production runs cfg.fused_adam.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fcsr_tpu.models.fused_step import (step_loss_pure,
                                            step_value_and_grad_fused)
    from fcsr_tpu.train import GSRTrainConfig

    cfg = GSRTrainConfig()
    small = "--small" in sys.argv
    if small:
        cfg = GSRTrainConfig(lr_dim=32, hr_dim=48, hidden_dim=48,
                             ks=(0.8, 0.5))
    print("device:", jax.devices()[0], "dims:",
          (cfg.lr_dim, cfg.hr_dim), flush=True)

    model = cfg.model()
    eye = jnp.eye(cfg.lr_dim, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), eye, u_lr=eye)
    rng = np.random.default_rng(0)
    u_lr = jnp.asarray(np.linalg.qr(
        rng.normal(size=(cfg.lr_dim, cfg.lr_dim)))[0].astype(np.float32))
    u_hr = jnp.asarray(rng.normal(
        size=(cfg.hr_dim, cfg.lr_dim)).astype(np.float32) * 0.1)
    hr = rng.random((cfg.hr_dim, cfg.hr_dim)).astype(np.float32)
    hr = jnp.asarray((hr + hr.T) / 2)

    # reference values via the pure-jnp step under XLA
    (want_loss, want_recon), want_grads = jax.value_and_grad(
        step_loss_pure, has_aux=True)(params, None, hr, u_lr, u_hr,
                                      cfg.ks, cfg.lr_dim, cfg.lmbda)

    t0 = time.perf_counter()
    try:
        loss, recon, grads = step_value_and_grad_fused(
            params, u_lr, u_hr, hr, cfg.ks, cfg.lr_dim, cfg.hr_dim,
            cfg.hidden_dim, cfg.lmbda, interpret=False)
        loss = float(loss)
        dt = time.perf_counter() - t0
        gmax = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(want_grads)))
        print(f"COMPILED+RAN in {dt:.1f}s: loss={loss:.6f} "
              f"(want {float(want_loss):.6f}) max_grad_diff={gmax:.2e}",
              flush=True)
    except Exception as e:
        dt = time.perf_counter() - t0
        print(f"FAILED after {dt:.1f}s: {type(e).__name__}", flush=True)
        tb = traceback.format_exc()
        print(tb[-2000:], flush=True)


if __name__ == "__main__":
    main()
