"""Time the MLP device-control chunk program's trace + server compile.

Round-3 follow-up to mlp_compile_breakdown.py: the individual step
programs compile in ~5 s total, yet the family bench's cold pass
measured 153-459 s. All three folds share identical shapes (112 train /
55 val), so the chunked control program (generic_loop.
_build_device_control_program) compiles exactly once — this script
isolates how much of the cold pass is that one compile, at the real
fold shapes, for several chunk lengths.

Run on the real TPU: python tools/experiments/mlp_chunk_compile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.models.mlp import SpectralResMLP
from fcsr_tpu.train.generic_loop import _build_device_control_program
from fcsr_tpu.train.losses import make_triu_mse_criterion, pack_triu_targets

N_IN, N_OUT, HID = 160, 268, (160 + 268) // 2
N_TR, N_VA, BS = 112, 55, 32


def main():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/fcsr_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("device:", jax.devices()[0], flush=True)

    model = SpectralResMLP(num_nodes_input=N_IN, num_nodes_output=N_OUT,
                           num_hidden=HID, n_layers=0, output="vector")
    rng = np.random.default_rng(0)
    lr_tr = jnp.asarray(rng.random((N_TR, 12720), dtype=np.float32))
    hr_tr = jnp.asarray(pack_triu_targets(
        rng.random((N_TR, N_OUT, N_OUT)).astype(np.float32)))
    lr_va, hr_va = lr_tr[:N_VA], hr_tr[:N_VA]
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           np.zeros((2, N_IN, N_IN), np.float32))
    crit = make_triu_mse_criterion(N_OUT)

    for chunk in (int(os.environ.get("CHUNK", 25)),):
        chunk_fn, tx = _build_device_control_program(
            model, crit, tuple(sorted(k for k in variables
                                      if k != "params")),
            0.01, BS, N_TR, 10, 1e-4, 0.1, 1.0, 0.01, 1e-5)
        opt_state = tx.init(variables["params"])
        carry = (variables, opt_state, jax.random.PRNGKey(0),
                 jnp.asarray(0.01, jnp.float32),
                 jnp.asarray(1.0, jnp.float32),
                 jnp.asarray(jnp.inf, jnp.float32),
                 jnp.asarray(0, jnp.int32),
                 jnp.asarray(jnp.inf, jnp.float32),
                 variables)
        perms = jnp.asarray(np.stack(
            [np.random.default_rng(i).permutation(N_TR).astype(np.int32)
             for i in range(chunk)]))
        flags = jnp.ones((chunk,), jnp.float32)

        t0 = time.perf_counter()
        low = chunk_fn.lower(carry, perms, flags, lr_tr, hr_tr,
                             lr_va, hr_va)
        t1 = time.perf_counter()
        comp = low.compile()
        t2 = time.perf_counter()
        out = comp(carry, perms, flags, lr_tr, hr_tr, lr_va, hr_va)
        jax.block_until_ready(out[1])
        t3 = time.perf_counter()
        print(f"chunk={chunk:3d}  trace {t1-t0:6.1f}s  "
              f"compile {t2-t1:6.1f}s  first-exec {t3-t2:6.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
