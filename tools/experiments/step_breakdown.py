"""Per-step time breakdown of the fused fold-parallel GSR trainer.

Times lax.scan'd variants of the training step (vmapped over 3 folds,
T iterations each) to locate the remaining per-step cost:

  fwd        — U-Net forward kernel only
  fwd+bwd    — value_and_grad through the fused U-Net (both kernels)
  +tail      — plus the fused tail kernel (full loss fwd+bwd)
  +unravel   — plus flat->tree unravel and tree->flat ravel marshalling
  full       — the production step (marshalling + Adam + data gathers)

Run on the TPU: python tools/experiments/step_breakdown.py [T]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.models.fused_step import unet_fused_fwdbwd
from fcsr_tpu.models.fused_tail import tail_loss_fused
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import adam_flat_update, stage_dataset
from fcsr_tpu.train.losses import l1

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
F = 3
cfg = GSRTrainConfig(fused_tail=True, fused_unet=True, fused_unet_bwd=True)
model = cfg.model()
dummy = jnp.eye(cfg.lr_dim, dtype=jnp.float32)
template = model.init(jax.random.PRNGKey(0), dummy, u_lr=dummy)
flat0, unravel = ravel_pytree(template)
flat_f = jnp.stack([flat0] * F)

data = load_or_synthesize(None, n_train=16, n_test=1, seed=42)
a_norm, hr_all, u_lr, u_hr = stage_dataset(cfg, data["lr_train"],
                                           data["hr_train"])
interp = jax.default_backend() != "tpu"


def run_scan(name, step):
    """step: (flat, i) -> flat; scanned T times, vmapped over folds."""

    def fold(flat):
        def body(carry, i):
            return step(carry, i), ()

        out, _ = jax.lax.scan(body, flat, jnp.arange(T), unroll=4)
        return out

    prog = jax.jit(jax.vmap(fold))
    out = prog(flat_f)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = prog(flat_f)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{name:10s}: {dt / T * 1e6:8.1f} us/step  ({dt:.3f}s total, "
          f"T={T})", flush=True)


def unet_of(flat):
    params = unravel(flat)
    return unet_fused_fwdbwd(params["params"]["net"], cfg.ks, cfg.lr_dim,
                             cfg.hr_dim, interpret=interp)


# 1. forward kernel only (carry must stay genuinely data-dependent or
# XLA hoists the whole body out of the scan)
def step_fwd(flat, i):
    net, start = unet_of(flat)
    return flat * (1.0 + 1e-12 * jnp.tanh(net[0, 0] + start[0, 0]))


run_scan("fwd", step_fwd)


# 2. forward+backward kernels
def loss_unet(flat, i):
    net, start = unet_of(flat)
    return cfg.lmbda * l1(net, start)


def step_fwdbwd(flat, i):
    loss, g = jax.value_and_grad(loss_unet)(flat, i)
    return flat - 1e-12 * jnp.tanh(g)


run_scan("fwd+bwd", step_fwdbwd)


# 2b. tail kernel only (fwd+grad; custom_vjp residual trick)
def loss_tail_only(flat, i):
    params = unravel(flat)
    w = params["params"]["layer"]["weights"]
    w1 = params["params"]["gc1"]["weight"]
    w2 = params["params"]["gc2"]["weight"]
    net = w.T * 0.5  # (lr_dim, hr_dim) stand-in features from params
    return tail_loss_fused(w, w1, w2, net, u_lr[i], u_hr[i], hr_all[i],
                           interpret=interp)


def step_tail_only(flat, i):
    loss, g = jax.value_and_grad(loss_tail_only)(flat, i)
    return flat - 1e-12 * jnp.tanh(g)


run_scan("tail only", step_tail_only)


# 3. + fused tail (full loss)
def loss_full(flat, i):
    params = unravel(flat)
    net, start = unet_fused_fwdbwd(params["params"]["net"], cfg.ks,
                                   cfg.lr_dim, cfg.hr_dim, interpret=interp)
    w = params["params"]["layer"]["weights"]
    w1 = params["params"]["gc1"]["weight"]
    w2 = params["params"]["gc2"]["weight"]
    tail = tail_loss_fused(w, w1, w2, net, u_lr[i], u_hr[i], hr_all[i],
                           interpret=interp)
    return cfg.lmbda * l1(net, start) + tail


def step_tail(flat, i):
    loss, g = jax.value_and_grad(loss_full)(flat, i)
    return flat - 1e-12 * jnp.tanh(g)


run_scan("+tail", step_tail)


# 4. full production step (adam + masking)
def step_full(flat, i):
    (loss, g) = jax.value_and_grad(loss_full)(flat, i)
    m = jnp.zeros_like(flat)
    v = jnp.zeros_like(flat)
    step, m, v = adam_flat_update(g, m, v, 1.0, cfg.lr)
    return flat - step * 1e-12


run_scan("full(adam)", step_full)
