"""Multi-device sharding tests on the virtual 8-device CPU mesh —
the TPU-native analog of a fake distributed backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from fcsr_tpu.parallel import batch_mesh, make_sharded_batch_step, shard_batch
from fcsr_tpu.train import GSRTrainConfig, init_gsr, precompute_spectral
from tests.conftest import random_symmetric


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = GSRTrainConfig(lr_dim=16, hr_dim=24, hidden_dim=24, ks=(0.8, 0.5),
                     epochs=1)


def _batch(rng, b):
    lr = np.stack([random_symmetric(rng, CFG.lr_dim) for _ in range(b)])
    hr = np.stack([random_symmetric(rng, CFG.hr_dim) for _ in range(b)])
    return lr, hr


def test_mesh_shapes():
    mesh = batch_mesh(jax.devices()[:8])
    assert mesh.axis_names == ("batch",)
    assert mesh.devices.shape == (8,)


def test_sharded_step_runs_and_is_replicated(rng):
    devices = jax.devices()[:8]
    mesh = batch_mesh(devices)
    model, params, tx, opt_state = init_gsr(CFG, jax.random.PRNGKey(0))
    lr, hr = _batch(rng, 8)
    u_lr, u_hr = precompute_spectral(lr, hr, lr_dim=CFG.lr_dim,
                                     padding=CFG.padding)
    lr_s, hr_s, u_lr_s, u_hr_s = shard_batch(
        mesh, lr, hr, np.asarray(u_lr, dtype=np.float32),
        np.asarray(u_hr, dtype=np.float32))
    # batch axis really is split across the 8 devices
    assert len(lr_s.sharding.device_set) == 8

    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    step = make_sharded_batch_step(model, tx, mesh, lmbda=CFG.lmbda,
                                   padding=CFG.padding)
    params2, opt_state2, loss, err = step(params, opt_state, lr_s, hr_s,
                                          u_lr_s, u_hr_s)
    assert np.isfinite(float(loss)) and np.isfinite(float(err))
    # updated params replicated across all devices
    leaf = jax.tree_util.tree_leaves(params2)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_step_matches_single_device(rng):
    """The 8-way data-parallel step computes the same mean-gradient update
    as the same batch on one device."""
    import optax
    from fcsr_tpu.core.normalize import unpad
    from fcsr_tpu.train.losses import gsr_composite_loss

    devices = jax.devices()
    mesh8 = batch_mesh(devices[:8])
    model, params0, tx, opt0 = init_gsr(CFG, jax.random.PRNGKey(1))
    lr, hr = _batch(rng, 8)
    u_lr, u_hr = precompute_spectral(lr, hr, lr_dim=CFG.lr_dim,
                                     padding=CFG.padding)
    u_lr = np.asarray(u_lr, dtype=np.float32)
    u_hr = np.asarray(u_hr, dtype=np.float32)

    # single-device reference update
    def batch_loss(params):
        def one(lr_m, hr_m, u_l, u_h):
            pred, net_outs, start_outs, _ = model.apply(params, lr_m,
                                                        u_lr=u_l)
            pred = unpad(pred, CFG.padding)
            w = params["params"]["layer"]["weights"]
            loss, err = gsr_composite_loss(pred, net_outs, start_outs, w,
                                           u_h, hr_m, CFG.lmbda)
            return loss
        return jnp.mean(jax.vmap(one)(jnp.asarray(lr), jnp.asarray(hr),
                                      jnp.asarray(u_lr), jnp.asarray(u_hr)))

    grads = jax.grad(batch_loss)(params0)
    updates, _ = tx.update(grads, opt0, params0)
    want = optax.apply_updates(params0, updates)

    # sharded update
    rep = NamedSharding(mesh8, P())
    lr_s, hr_s, u_lr_s, u_hr_s = shard_batch(mesh8, lr, hr, u_lr, u_hr)
    step = make_sharded_batch_step(model, tx, mesh8, lmbda=CFG.lmbda,
                                   padding=CFG.padding)
    got, _, _, _ = step(jax.device_put(params0, rep),
                        jax.device_put(opt0, rep), lr_s, hr_s,
                        u_lr_s, u_hr_s)

    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
