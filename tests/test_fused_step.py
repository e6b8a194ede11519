"""Rank-select (gather-free) GSR step formulation: bit-exact equivalence
with the top_k/gather model under XLA, and the fused kernels in interpret
mode. (On-hardware status: see models/fused_step.py docstring.)"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.core.normalize import normalize_adj, unpad
from fcsr_tpu.models.fused_step import (
    _topk_projection,
    step_loss_pure,
    step_value_and_grad_fused,
    unet_forward_rankselect,
)
from fcsr_tpu.train import GSRTrainConfig, init_gsr
from fcsr_tpu.train.losses import gsr_composite_loss
from tests.conftest import random_symmetric

CFG = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32, ks=(0.9, 0.7))


def test_topk_projection_matches_lax_topk(rng):
    for n, k in [(160, 144), (101, 61), (13, 5)]:
        scores = jnp.asarray(rng.random(n).astype(np.float32))
        proj = np.asarray(_topk_projection(scores, k))
        vals, idx = jax.lax.top_k(scores, k)
        want = np.zeros((k, n), dtype=np.float32)
        want[np.arange(k), np.asarray(idx)] = 1.0
        np.testing.assert_array_equal(proj, want)


def _setup(rng):
    model, params, _, _ = init_gsr(CFG, jax.random.PRNGKey(0))
    lr_m = random_symmetric(rng, CFG.lr_dim)
    hr_m = jnp.asarray(random_symmetric(rng, CFG.hr_dim))
    a_norm = normalize_adj(jnp.asarray(lr_m))
    _, u_lr = jnp.linalg.eigh(a_norm)
    u_hr = jnp.asarray(rng.normal(
        size=(CFG.hr_dim, CFG.lr_dim)).astype(np.float32))
    return model, params, a_norm, hr_m, u_lr, u_hr


@pytest.mark.slow
def test_rankselect_step_loss_bitexact_vs_model(rng):
    """step_loss_pure (comparison-matmul pooling) == the gather/top_k
    GSRNet loss, value AND grads, bit-for-bit under XLA."""
    model, params, a_norm, hr_m, u_lr, u_hr = _setup(rng)

    def loss_unfused(params):
        pred, net_outs, start_outs, _ = model.apply(params, a_norm,
                                                    u_lr=u_lr,
                                                    a_norm=a_norm)
        w = params["params"]["layer"]["weights"]
        return gsr_composite_loss(unpad(pred, 0), net_outs, start_outs, w,
                                  u_hr, hr_m, CFG.lmbda)

    (l0, e0), g0 = jax.value_and_grad(loss_unfused, has_aux=True)(params)
    (l1, e1), g1 = jax.value_and_grad(
        lambda p: step_loss_pure(p, a_norm, hr_m, u_lr, u_hr, CFG.ks,
                                 CFG.lr_dim, CFG.lmbda),
        has_aux=True)(params)
    np.testing.assert_allclose(float(l0), float(l1), atol=2e-6)
    np.testing.assert_allclose(float(e0), float(e1), atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.slow
def test_fused_step_kernel_interpret(rng):
    model, params, a_norm, hr_m, u_lr, u_hr = _setup(rng)
    (l0, e0), g0 = jax.value_and_grad(
        lambda p: step_loss_pure(p, None, hr_m, u_lr, u_hr, CFG.ks,
                                 CFG.lr_dim, CFG.lmbda),
        has_aux=True)(params)
    l1, e1, g1 = step_value_and_grad_fused(
        params, u_lr, u_hr, hr_m, CFG.ks, CFG.lr_dim, CFG.hr_dim,
        CFG.hidden_dim, CFG.lmbda, interpret=True)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_rankselect_matches_module(rng):
    model, params, a_norm, *_ = _setup(rng)
    from fcsr_tpu.models.gsr import GraphUnet
    unet = GraphUnet(CFG.ks, CFG.lr_dim, CFG.hr_dim, dim=CFG.hr_dim)
    eye = jnp.eye(CFG.lr_dim, dtype=jnp.float32)
    want_net, want_start = unet.apply(
        {"params": params["params"]["net"]}, a_norm, eye)
    got_net, got_start = unet_forward_rankselect(params["params"]["net"],
                                                 CFG.ks, CFG.lr_dim)
    np.testing.assert_allclose(np.asarray(got_net), np.asarray(want_net),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_start),
                               np.asarray(want_start), atol=2e-6)


@pytest.mark.slow
def test_unet_fused_fwdonly_interpret(rng):
    """Fused-forward U-Net (interpret) + XLA backward matches the pure
    rank-select function's value and gradients."""
    import jax.numpy as jnp
    from fcsr_tpu.models.fused_step import unet_fused_fwdonly
    model, params, _, _ = init_gsr(CFG, jax.random.PRNGKey(0))
    net_params = params["params"]["net"]

    def loss_fused(net_params):
        net, start = unet_fused_fwdonly(net_params, CFG.ks, CFG.lr_dim,
                                        CFG.hr_dim, interpret=True)
        return jnp.mean(jnp.abs(net - start)) + jnp.sum(net * net) * 1e-3

    def loss_ref(net_params):
        net, start = unet_forward_rankselect(net_params, CFG.ks,
                                             CFG.lr_dim)
        return jnp.mean(jnp.abs(net - start)) + jnp.sum(net * net) * 1e-3

    l1, g1 = jax.value_and_grad(loss_fused)(net_params)
    l0, g0 = jax.value_and_grad(loss_ref)(net_params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_unet_fused_fwdbwd_interpret(rng):
    """Hand-written residual-based backward kernel (interpret) matches
    jax.grad of the pure rank-select function to reassociation level
    (the adjoints are ideal transposed bf16x3 matmuls, not the vjp of the
    bf16x3 cast chain — ~1e-4 relative on the worst tiny pool-bias grad)."""
    import jax.numpy as jnp
    from fcsr_tpu.models.fused_step import unet_fused_fwdbwd
    model, params, _, _ = init_gsr(CFG, jax.random.PRNGKey(0))
    net_params = params["params"]["net"]
    ct_net = jnp.asarray(rng.normal(
        size=(CFG.lr_dim, CFG.hr_dim)).astype(np.float32))
    ct_start = jnp.asarray(rng.normal(
        size=(CFG.lr_dim, CFG.hr_dim)).astype(np.float32))

    def loss_fused(net_params):
        net, start = unet_fused_fwdbwd(net_params, CFG.ks, CFG.lr_dim,
                                       CFG.hr_dim, interpret=True)
        return jnp.sum(net * ct_net) + jnp.sum(start * ct_start)

    def loss_ref(net_params):
        net, start = unet_forward_rankselect(net_params, CFG.ks,
                                             CFG.lr_dim)
        return jnp.sum(net * ct_net) + jnp.sum(start * ct_start)

    l1, g1 = jax.value_and_grad(loss_fused)(net_params)
    l0, g0 = jax.value_and_grad(loss_ref)(net_params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-4)


@pytest.mark.slow
def test_fused_bwd_trainer_matches_fwdonly(rng):
    """Trainer trajectories with the hand-written backward kernel track
    the fused-forward/XLA-backward path (4 epochs, small dims)."""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    hists = []
    for bwd in (False, True):
        cfg = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                             ks=(0.9, 0.7), epochs=4, fused_tail=True,
                             fused_unet=True, fused_unet_bwd=bwd)
        r = GSRFoldRunner(cfg, lr, hr, folds)
        _, lh, _ = r.train()
        maes, _ = r.evaluate()
        hists.append((np.asarray(lh), np.asarray(maes)))
    np.testing.assert_allclose(hists[0][0], hists[1][0], atol=1e-4)
    np.testing.assert_allclose(hists[0][1], hists[1][1], atol=1e-5)


@pytest.mark.slow
def test_gsr_step_fused_full_interpret(rng):
    """Whole-step SINGLE kernel (U-Net fwd + tail AD + hand-written U-Net
    adjoints, models/fused_step.py::gsr_step_loss_fused) matches
    step_loss_pure's value, aux and gradients in interpret mode."""
    from fcsr_tpu.models.fused_step import gsr_step_loss_fused
    model, params, a_norm, hr_m, u_lr, u_hr = _setup(rng)

    (l0, e0), g0 = jax.value_and_grad(
        lambda p: step_loss_pure(p, None, hr_m, u_lr, u_hr, CFG.ks,
                                 CFG.lr_dim, CFG.lmbda),
        has_aux=True)(params)

    def loss_fused(p):
        pp = p["params"]
        return gsr_step_loss_fused(
            pp["net"], pp["layer"]["weights"], pp["gc1"]["weight"],
            pp["gc2"]["weight"], u_lr, u_hr, hr_m, CFG.ks, CFG.lr_dim,
            CFG.hr_dim, CFG.lmbda, interpret=True)

    (l1, e1), g1 = jax.value_and_grad(loss_fused, has_aux=True)(params)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-5)
    np.testing.assert_allclose(float(e1), float(e0), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-4)


@pytest.mark.slow
def test_fused_step_trainer_matches_three_kernel(rng):
    """Trainer trajectories with cfg.fused_step (one kernel per step)
    track the production three-kernel fused path (4 epochs, small dims)."""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    hists = []
    for kw in (dict(fused_tail=True, fused_unet=True, fused_unet_bwd=True),
               dict(fused_step=True)):
        cfg = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                             ks=(0.9, 0.7), epochs=4, **kw)
        r = GSRFoldRunner(cfg, lr, hr, folds)
        _, lh, _ = r.train()
        maes, _ = r.evaluate()
        hists.append((np.asarray(lh), np.asarray(maes)))
    np.testing.assert_allclose(hists[0][0], hists[1][0], atol=1e-4)
    np.testing.assert_allclose(hists[0][1], hists[1][1], atol=1e-5)


@pytest.mark.slow
def test_fully_fused_trainer_matches_unfused(rng):
    """fast trainer with fused_tail+fused_unet (interpret on CPU) tracks
    the unfused trainer's loss history."""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    base = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                          ks=(0.9, 0.7), epochs=2)
    _, lh0, _ = GSRFoldRunner(base, lr, hr, folds).train()
    fused = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                           ks=(0.9, 0.7), epochs=2, fused_tail=True,
                           fused_unet=True)
    _, lh1, _ = GSRFoldRunner(fused, lr, hr, folds).train()
    np.testing.assert_allclose(np.asarray(lh0), np.asarray(lh1), atol=1e-4)


@pytest.mark.slow
def test_fused_adam_trainer_bitexact_vs_fused_step(rng):
    """cfg.fused_adam (fwd+bwd+Adam in ONE kernel) is bit-exact vs the
    fused_step path on CPU: Adam is elementwise, so per-leaf in-kernel
    updates equal the flat-vector update exactly. (On v5e the kernel
    exceeds the scoped-VMEM limit — see the module STATUS — so this
    contract is pinned in interpret mode.)"""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    hists = []
    for kw in (dict(fused_step=True), dict(fused_adam=True)):
        cfg = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                             ks=(0.9, 0.7), epochs=3, **kw)
        r = GSRFoldRunner(cfg, lr, hr, folds)
        _, lh, _ = r.train()
        maes, _ = r.evaluate()
        hists.append((np.asarray(lh), np.asarray(maes)))
    np.testing.assert_array_equal(hists[0][0], hists[1][0])
    np.testing.assert_array_equal(hists[0][1], hists[1][1])
