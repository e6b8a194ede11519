"""Where do the MLP family's 430-830 s cold compiles go?

Times .lower() (trace) and .compile() (server-side XLA) separately for
each program the shipped run_mlp_cv path actually builds, at the real
fold shapes (n_train ~111, bs 32 -> scan of 3 full batches + remainder
15 + eval). Run on the real TPU.
"""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax, jax.numpy as jnp, numpy as np, optax

from fcsr_tpu.models.mlp import SpectralResMLP
from fcsr_tpu.train.generic_loop import _make_step_fns
from fcsr_tpu.train.losses import make_triu_mse_criterion, pack_triu_targets

N_IN, N_OUT, HID = 160, 268, (160 + 268) // 2
L_IN, L_OUT = 12720, 35778

def timed(name, fn, *args):
    t0 = time.perf_counter(); low = fn.lower(*args)
    t1 = time.perf_counter(); comp = low.compile()
    t2 = time.perf_counter()
    print(f"{name:28s} trace {t1-t0:7.1f}s  compile {t2-t1:7.1f}s", flush=True)
    return comp

def main():
    print("device:", jax.devices()[0], flush=True)
    model = SpectralResMLP(num_nodes_input=N_IN, num_nodes_output=N_OUT,
                           num_hidden=HID, n_layers=0, output="vector")
    rng = np.random.default_rng(0)
    lr_all = jnp.asarray(rng.random((111, L_IN), dtype=np.float32))
    hr_mat = rng.random((111, N_OUT, N_OUT), dtype=np.float32)
    hr_all = jnp.asarray(pack_triu_targets(hr_mat.astype(np.float32)))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           np.zeros((2, N_IN, N_IN), np.float32))
    crit = make_triu_mse_criterion(N_OUT)
    def tx_factory(learning_rate):
        return optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adamw(learning_rate=learning_rate))
    tx = optax.inject_hyperparams(tx_factory)(learning_rate=0.01)
    opt_state = tx.init(variables["params"])
    mutable = tuple(k for k in variables if k != "params")
    # _make_step_fns returns PLAIN functions since the on-device-control
    # refactor (the chunk program embeds them); jit here to .lower()
    train_step, train_epoch_full, eval_step = (
        jax.jit(f) for f in _make_step_fns(model, tx, crit, mutable))

    key = jax.random.PRNGKey(0)
    idx3 = jnp.asarray(np.arange(96, dtype=np.int32).reshape(3, 32))
    idx_rem = jnp.asarray(np.arange(96, 111, dtype=np.int32))
    timed("train_epoch_full(scan x3)", train_epoch_full, variables,
          opt_state, lr_all, hr_all, idx3, key)
    timed("train_step(remainder 15)", train_step, variables, opt_state,
          lr_all, hr_all, idx_rem, key)
    timed("eval_step(37)", eval_step, variables, lr_all[:37], hr_all[:37])

if __name__ == "__main__":
    main()
