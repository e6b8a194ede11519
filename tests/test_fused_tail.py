"""Fused Pallas GSR-tail: value and gradients must match the plain-XLA
tail exactly (interpret mode on the CPU test platform; the compiled Mosaic
version is validated on hardware — see PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcsr_tpu.models.fused_tail import (
    _tail_loss,
    tail_loss_fused,
    tail_loss_reference,
)


@pytest.fixture
def tail_args(rng):
    hr_dim, lr_dim, hidden = 32, 20, 32
    shapes = [(hr_dim, lr_dim), (hr_dim, hidden), (hidden, hr_dim),
              (lr_dim, hr_dim), (lr_dim, lr_dim), (hr_dim, lr_dim),
              (hr_dim, hr_dim)]
    return [jnp.asarray(rng.normal(size=s).astype(np.float32))
            for s in shapes]


def test_fused_value_matches_reference(tail_args):
    loss_ref, recon, _ = tail_loss_reference(*tail_args)
    loss_f = tail_loss_fused(*tail_args, interpret=True)
    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-5)


def test_fused_gradients_match_reference(tail_args):
    _, _, grads_ref = tail_loss_reference(*tail_args)
    g = jax.grad(
        lambda a, b, c, d: tail_loss_fused(a, b, c, d, *tail_args[4:],
                                           interpret=True),
        argnums=(0, 1, 2, 3))(*tail_args[:4])
    for x, y in zip(grads_ref, g):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_tail_matches_gsrnet_tail(rng, tail_args):
    """The pure tail function reproduces GSRNet's spectral-layer+decoder
    output semantics: same loss as running the full model and composing
    the loss terms manually."""
    from fcsr_tpu.core.normalize import normalize_adj
    from fcsr_tpu.train import GSRTrainConfig, init_gsr
    from fcsr_tpu.train.losses import l1
    from tests.conftest import random_symmetric

    cfg = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32, ks=(0.9, 0.7))
    model, params, _, _ = init_gsr(cfg, jax.random.PRNGKey(0))
    lr_m = jnp.asarray(random_symmetric(rng, 20))
    hr_m = jnp.asarray(random_symmetric(rng, 32))
    a_norm = normalize_adj(lr_m)
    _, u_lr = jnp.linalg.eigh(a_norm)
    u_hr = tail_args[5][:, :20]

    pred, net_outs, start_outs, _ = model.apply(params, lr_m, u_lr=u_lr)
    want = float(l1(params["params"]["layer"]["weights"], u_hr)
                 + l1(pred, hr_m))

    got = float(_tail_loss(params["params"]["layer"]["weights"],
                           params["params"]["gc1"]["weight"],
                           params["params"]["gc2"]["weight"],
                           net_outs, u_lr, u_hr, hr_m)[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_trainer_flag_wires_up(rng):
    """fused_tail=True trainer builds and runs (interpret mode on CPU)
    and matches the unfused trainer's first-epoch loss."""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train import GSRTrainConfig
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    base = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                          ks=(0.9, 0.7), epochs=2)
    r0 = GSRFoldRunner(base, lr, hr, folds)
    _, lh0, _ = r0.train()
    fused_cfg = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                               ks=(0.9, 0.7), epochs=2, fused_tail=True)
    r1 = GSRFoldRunner(fused_cfg, lr, hr, folds)
    _, lh1, _ = r1.train()
    np.testing.assert_allclose(np.asarray(lh0), np.asarray(lh1), atol=1e-4)
