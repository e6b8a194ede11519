"""Isolated per-kernel step times on the TPU (hoist-proof).

Each scanned body perturbs its params with the iteration index before
calling the kernel, so XLA cannot hoist the kernel out of the loop, and
feeds a scalar of the result back into the carry. The perturb+feedback
overhead is measured by the 'baseline' variant and is ~a few us.

Run: python tools/experiments/kernel_times.py [T]
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
from fcsr_tpu.models.fused_step import unet_fused_fwdbwd, unet_fused_fwdonly
from fcsr_tpu.models.fused_tail import tail_loss_fused
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import stage_dataset
from fcsr_tpu.train.losses import l1

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
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


def run_scan(name, body):
    """body(flat_perturbed, i) -> scalar; scanned T times over F folds."""

    def fold(flat):
        def step(carry, i):
            fp = flat * (1.0 + 1e-9 * carry)
            s = body(fp, i)
            return s * 1e-9, ()

        out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(T))
        return out

    prog = jax.jit(jax.vmap(fold))
    prog(flat_f).block_until_ready()
    t0 = time.perf_counter()
    prog(flat_f).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{name:12s}: {dt / T * 1e6:8.1f} us/step ({dt:.3f}s, T={T})",
          flush=True)


run_scan("baseline", lambda fp, i: jnp.sum(fp[:4]))


def unet_fb(fp, i):
    net, start = unet_fused_fwdbwd(unravel(fp)["params"]["net"], cfg.ks,
                                   cfg.lr_dim, cfg.hr_dim, interpret=interp)
    return net[0, 0] + start[0, 0]


run_scan("unet fwd", unet_fb)


def unet_fo(fp, i):
    net, start = unet_fused_fwdonly(unravel(fp)["params"]["net"], cfg.ks,
                                    cfg.lr_dim, cfg.hr_dim, interpret=interp)
    return net[0, 0] + start[0, 0]


run_scan("unetfo fwd", unet_fo)


def unet_grad(fp, i):
    def loss(fp):
        net, start = unet_fused_fwdbwd(unravel(fp)["params"]["net"],
                                       cfg.ks, cfg.lr_dim, cfg.hr_dim,
                                       interpret=interp)
        return cfg.lmbda * l1(net, start)

    v, g = jax.value_and_grad(loss)(fp)
    return v + jnp.sum(g[:4])


run_scan("unet f+b", unet_grad)


def tail_grad(fp, i):
    def loss(fp):
        p = unravel(fp)["params"]
        net = p["layer"]["weights"].T * 0.5
        return tail_loss_fused(p["layer"]["weights"], p["gc1"]["weight"],
                               p["gc2"]["weight"], net, u_lr[i], u_hr[i],
                               hr_all[i], interpret=interp)

    v, g = jax.value_and_grad(loss)(fp)
    return v + jnp.sum(g[:4])


run_scan("tail f+b", tail_grad)
