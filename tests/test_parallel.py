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


@pytest.mark.slow
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


@pytest.mark.slow
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


def _fold_dataset(rng, n=24):
    lr = np.stack([random_symmetric(rng, CFG.lr_dim) for _ in range(n)])
    hr = np.stack([random_symmetric(rng, CFG.hr_dim) for _ in range(n)])
    return lr, hr


@pytest.mark.slow
def test_fold_sharded_trainer_matches_single_device(rng):
    """The PRODUCTION multi-chip path: GSRFoldRunner with a mesh shards the
    fold axis over 8 devices (3 real folds padded with masked no-op folds)
    and must reproduce the single-device per-fold loss histories, val MAEs
    and final parameters."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    cfg = GSRTrainConfig(lr_dim=16, hr_dim=24, hidden_dim=24, ks=(0.8, 0.5),
                         epochs=3)
    lr, hr = _fold_dataset(rng)
    folds = kfold_indices(len(lr), 3, seed=42)

    single = GSRFoldRunner(cfg, lr, hr, folds)
    p1, lh1, eh1 = single.train()
    m1, _ = single.evaluate()

    mesh = batch_mesh(jax.devices()[:8])
    sharded = GSRFoldRunner(cfg, lr, hr, folds, mesh=mesh)
    # fold-axis state really is split across the 8 devices
    assert len(sharded.flat0.sharding.device_set) == 8
    assert sharded.flat0.shape[0] == 8  # 3 folds padded to the mesh size
    p2, lh2, eh2 = sharded.train()
    m2, _ = sharded.evaluate()

    assert np.asarray(lh2).shape == (3, cfg.epochs)  # sliced to real folds
    np.testing.assert_allclose(np.asarray(lh1), np.asarray(lh2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(eh1), np.asarray(eh2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2)[:3],
                               atol=2e-5)


@pytest.mark.slow
def test_fold_sharded_trainer_divisible_fold_count(rng):
    """4 folds on a 4-device submesh — no padding branch."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    cfg = GSRTrainConfig(lr_dim=16, hr_dim=24, hidden_dim=24, ks=(0.8, 0.5),
                         epochs=2)
    lr, hr = _fold_dataset(rng)
    folds = kfold_indices(len(lr), 4, seed=42)

    single = GSRFoldRunner(cfg, lr, hr, folds)
    _, lh1, _ = single.train()
    mesh = batch_mesh(jax.devices()[:4])
    sharded = GSRFoldRunner(cfg, lr, hr, folds, mesh=mesh)
    assert sharded.flat0.shape[0] == 4
    _, lh2, _ = sharded.train()
    np.testing.assert_allclose(np.asarray(lh1), np.asarray(lh2), atol=2e-5)


@pytest.mark.slow
def test_fold_sharded_checkpoint_chunks(rng, tmp_path):
    """Chunked (checkpointed) sharded training matches the single-shot
    sharded run — the bench's resilience path under multi-chip."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    cfg = GSRTrainConfig(lr_dim=16, hr_dim=24, hidden_dim=24, ks=(0.8, 0.5),
                         epochs=4)
    lr, hr = _fold_dataset(rng)
    folds = kfold_indices(len(lr), 2, seed=42)
    mesh = batch_mesh(jax.devices()[:2])

    oneshot = GSRFoldRunner(cfg, lr, hr, folds, mesh=mesh)
    _, lh1, _ = oneshot.train()
    chunked = GSRFoldRunner(cfg, lr, hr, folds, mesh=mesh)
    _, lh2, _ = chunked.train(checkpoint_path=str(tmp_path / "ck.msgpack"),
                              checkpoint_every=2)
    np.testing.assert_allclose(np.asarray(lh1), np.asarray(lh2), atol=1e-6)


@pytest.mark.slow
def test_fold_sharded_fused_adam_matches_single(rng):
    """The production fused whole-step+Adam kernel under the fold-sharded
    mesh is bit-equal to the single-device run (interpret kernels on the
    8-CPU mesh)."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.fast_loop import GSRFoldRunner

    cfg = GSRTrainConfig(lr_dim=16, hr_dim=24, hidden_dim=24,
                         ks=(0.8, 0.5), epochs=2, fused_adam=True)
    lr, hr = _fold_dataset(rng)
    folds = kfold_indices(len(lr), 2, seed=42)
    mesh = batch_mesh(jax.devices()[:2])

    single = GSRFoldRunner(cfg, lr, hr, folds)
    _, lh1, _ = single.train()
    m1, _ = single.evaluate()
    sharded = GSRFoldRunner(cfg, lr, hr, folds, mesh=mesh)
    _, lh2, _ = sharded.train()
    m2, _ = sharded.evaluate()
    np.testing.assert_array_equal(np.asarray(lh1), np.asarray(lh2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


@pytest.mark.slow
def test_gat_fold_sharded_matches_single_device(rng):
    """The GAT fold-parallel trainer with mesh= shards the fold axis
    (3 real folds padded to the 8-device mesh with masked no-op folds)
    and must reproduce the single-device histories and best params
    (drop_p=0: the dropout-key choreography cannot affect the math)."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.gat_loop import (GATTrainConfig,
                                         train_gat_folds_parallel)
    from jax.flatten_util import ravel_pytree

    cfg = GATTrainConfig(n_nodes=20, m_nodes=32, ks=(0.5, 0.5), dim=8,
                         epochs=3, drop_p=0.0)
    lr = np.stack([random_symmetric(rng, 20) for _ in range(12)])
    hr = np.stack([random_symmetric(rng, 32) for _ in range(12)])
    folds = kfold_indices(12, 3, seed=42)

    _, v1, h1 = train_gat_folds_parallel(cfg, lr, hr, folds, seed=42)
    mesh = batch_mesh(jax.devices()[:8])
    _, v2, h2 = train_gat_folds_parallel(cfg, lr, hr, folds, seed=42,
                                         mesh=mesh)
    assert len(v2) == 3  # sliced back to the real folds
    for j in range(3):
        np.testing.assert_allclose(h1[j]["val"], h2[j]["val"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(h1[j]["train"], h2[j]["train"],
                                   rtol=2e-4, atol=2e-5)
        f1 = np.asarray(ravel_pytree(v1[j]["params"])[0])
        f2 = np.asarray(ravel_pytree(v2[j]["params"])[0])
        # a handful of params drift to ~7e-4 over 3 epochs: AdamW's
        # rsqrt amplifies last-ulp fusion differences between the
        # sharded and unsharded compiles (histories above stay tight)
        np.testing.assert_allclose(f1, f2, atol=1e-3)


@pytest.mark.slow
def test_gat_sharded_chunk_program_cached(rng):
    """Repeat multichip trainer calls must reuse ONE sharded chunk
    program (a fresh jax.jit per call re-traces + re-lowers the whole
    25-epoch program — the fixed overhead PERF.md's teardown removed)
    and still produce identical results."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.gat_loop import (_SHARDED_CHUNK_PROGRAMS,
                                         GATTrainConfig,
                                         train_gat_folds_parallel)

    cfg = GATTrainConfig(n_nodes=20, m_nodes=32, ks=(0.5, 0.5), dim=8,
                         epochs=2, drop_p=0.0)
    lr = np.stack([random_symmetric(rng, 20) for _ in range(8)])
    hr = np.stack([random_symmetric(rng, 32) for _ in range(8)])
    folds = kfold_indices(8, 2, seed=0)
    mesh = batch_mesh(jax.devices()[:8])

    _, _, h1 = train_gat_folds_parallel(cfg, lr, hr, folds, seed=0,
                                        mesh=mesh)
    n_progs = len(_SHARDED_CHUNK_PROGRAMS)
    _, _, h2 = train_gat_folds_parallel(cfg, lr, hr, folds, seed=0,
                                        mesh=mesh)
    assert len(_SHARDED_CHUNK_PROGRAMS) == n_progs  # no new program
    for a, b in zip(h1, h2):
        np.testing.assert_array_equal(a["val"], b["val"])
