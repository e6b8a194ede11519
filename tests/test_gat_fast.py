"""Fold-parallel GAT trainer (train/gat_loop.py::train_gat_folds_parallel)
— equivalence against the single-fold reference-semantics loop."""

import jax
import numpy as np
import pytest

from fcsr_tpu.train.gat_loop import (GATTrainConfig, init_gat, train_gat,
                                     train_gat_folds_parallel)
from tests.conftest import random_symmetric


def _dataset(rng, n=12, n_nodes=20, m_nodes=32):
    lr = np.stack([random_symmetric(rng, n_nodes) for _ in range(n)])
    hr = np.stack([random_symmetric(rng, m_nodes) for _ in range(n)])
    return lr, hr


# drop_p=0 so the two implementations' different dropout-key choreography
# cannot affect the math; everything else (shuffling, AdamW, plateau
# schedule, best-state, masking) must line up.
CFG = GATTrainConfig(n_nodes=20, m_nodes=32, ks=(0.5, 0.5), dim=8,
                     epochs=3, drop_p=0.0)


@pytest.mark.slow
def test_fold_parallel_matches_single_fold(rng):
    from fcsr_tpu.data.datamodule import kfold_indices

    lr_all, hr_all = _dataset(rng)
    folds = kfold_indices(len(lr_all), 2, seed=42)

    model, best_vars, hists = train_gat_folds_parallel(
        CFG, lr_all, hr_all, folds, seed=42)

    for j, (tr, va) in enumerate(folds):
        m, variables, tx, opt = init_gat(CFG, jax.random.PRNGKey(42 + j))
        _, _, hist = train_gat(variables, opt, m, tx, CFG,
                               lr_all[tr], hr_all[tr],
                               lr_all[va], hr_all[va], seed=42 + j)
        np.testing.assert_allclose(hists[j]["val"], hist["val"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(hists[j]["train"], hist["train"],
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fold_parallel_ragged_folds(rng):
    """3 folds over 11 samples: ragged train/val sizes exercise the
    masked-step padding; histories must be finite and losses decrease."""
    from fcsr_tpu.data.datamodule import kfold_indices

    lr_all, hr_all = _dataset(rng, n=11)
    folds = kfold_indices(11, 3, seed=0)
    assert len({len(tr) for tr, _ in folds}) > 1  # really ragged

    _, best_vars, hists = train_gat_folds_parallel(
        CFG, lr_all, hr_all, folds, seed=0)
    assert len(best_vars) == 3
    for h in hists:
        assert np.isfinite(h["train"]).all() and np.isfinite(h["val"]).all()
        assert h["val"][-1] <= h["val"][0] * 1.05


@pytest.mark.slow
def test_device_control_matches_host_control(rng):
    """The on-device control loop (plateau scheduler, best-state,
    early-stop as scan carry) must make EXACTLY the decisions of the
    legacy per-epoch host loop: same decay epochs, same best-epoch
    index, same history lengths, matching losses and best params.
    Aggressive plateau settings force decays + early stop within the
    run so the control logic is actually exercised."""
    from jax.flatten_util import ravel_pytree

    from fcsr_tpu.data.datamodule import kfold_indices

    cfg = GATTrainConfig(n_nodes=20, m_nodes=32, ks=(0.5, 0.5), dim=8,
                         epochs=12, drop_p=0.0, patience=1,
                         plateau_threshold=0.5, plateau_factor=0.05)
    lr_all, hr_all = _dataset(rng)
    folds = kfold_indices(len(lr_all), 3, seed=7)

    _, vars_dev, hists_dev = train_gat_folds_parallel(
        cfg, lr_all, hr_all, folds, seed=7, control_chunk_epochs=5)
    _, vars_host, hists_host = train_gat_folds_parallel(
        cfg, lr_all, hr_all, folds, seed=7, host_control=True)

    for j in range(len(folds)):
        hd, hh = hists_dev[j], hists_host[j]
        # identical epochs run (early stop fired at the same epoch)
        assert len(hd["val"]) == len(hh["val"])
        # identical decay epochs: lr changes at the same indices
        dev_decays = [i for i in range(1, len(hd["lr"]))
                      if hd["lr"][i] != hd["lr"][i - 1]]
        host_decays = [i for i in range(1, len(hh["lr"]))
                       if hh["lr"][i] != hh["lr"][i - 1]]
        assert dev_decays == host_decays
        np.testing.assert_allclose(hd["lr"], hh["lr"], rtol=1e-6)
        # same best-epoch index
        assert int(np.argmin(hd["val"])) == int(np.argmin(hh["val"]))
        np.testing.assert_allclose(hd["val"], hh["val"], rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(hd["train"], hh["train"], rtol=2e-4,
                                   atol=2e-5)
        fd = ravel_pytree(vars_dev[j]["params"])[0]
        fh = ravel_pytree(vars_host[j]["params"])[0]
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fh),
                                   rtol=2e-4, atol=2e-5)
    # the aggressive schedule must actually have decayed somewhere,
    # or this test proves nothing
    assert any(len(set(h["lr"])) > 1 for h in hists_host)


def test_bottom_gat_applies_dropout(rng):
    """The bottom DenseGAT must receive drop_p (the reference's bottom GT
    does: unet-transformer.py:296); with ks=() the model is bottom +
    upsampler only, so differing outputs across dropout keys prove the
    bottom layer's dropout is live."""
    import jax

    from fcsr_tpu.models.gat_unet import GATGraphUnet

    model = GATGraphUnet(ks=(), n_nodes=20, m_nodes=32, dim=8,
                         drop_p=0.5)
    a = np.asarray(random_symmetric(rng, 20))
    x = np.asarray(rng.standard_normal((20, 8)), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, a, x=x)
    outs = [model.apply(variables, a, x=x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(k)})[0]
            for k in (2, 3)]
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    # and at train=False dropout is off: deterministic
    o1 = model.apply(variables, a, x=x, train=False)[0]
    o2 = model.apply(variables, a, x=x, train=False)[0]
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_predict_programs_cached_across_calls(rng):
    """predict_gat / predict_gat_folds reuse ONE jitted program across
    calls and across equal-config model objects (flax modules hash by
    structure) — a fresh jax.jit per call re-traces the whole U-Net and
    cost the family bench ~16 s/pass of pure dispatch (PERF.md)."""
    from fcsr_tpu.models.gat_unet import GATGraphUnet
    from fcsr_tpu.train.gat_loop import (GATTrainConfig, init_gat,
                                         precompute_gat_features,
                                         predict_gat, predict_gat_folds,
                                         _FOLD_PREDICT_PROGRAMS,
                                         _PREDICT_PROGRAMS)
    from fcsr_tpu.utils.transfer import device_put_fast

    cfg = GATTrainConfig(n_nodes=20, m_nodes=32, ks=(0.5,), dim=8,
                         drop_p=0.0)
    model, variables, _, _ = init_gat(cfg, jax.random.PRNGKey(0))
    lr = np.stack([random_symmetric(rng, 20) for _ in range(4)])

    n0 = len(_PREDICT_PROGRAMS)
    p1 = np.asarray(predict_gat(variables, model, cfg, lr))
    # equal-config model built later (a second bench pass) shares the entry
    model2 = GATGraphUnet(ks=cfg.ks, n_nodes=20, m_nodes=32, dim=8,
                          heads=cfg.heads, drop_p=cfg.drop_p)
    p2 = np.asarray(predict_gat(variables, model2, cfg, lr))
    assert len(_PREDICT_PROGRAMS) == n0 + 1
    np.testing.assert_array_equal(p1, p2)

    # fold-vmapped program: cached per (model, flat width), and exact vs
    # the single-model path on the same params
    lr_d = device_put_fast(lr)
    x_d = precompute_gat_features(lr, dim=cfg.dim)
    va_idx = np.array([[0, 1], [2, 3]], np.int32)
    m0 = len(_FOLD_PREDICT_PROGRAMS)
    f1 = np.asarray(predict_gat_folds(model, [variables, variables],
                                      lr_d, x_d, va_idx))
    f2 = np.asarray(predict_gat_folds(model2, [variables, variables],
                                      lr_d, x_d, va_idx))
    assert len(_FOLD_PREDICT_PROGRAMS) == m0 + 1
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_allclose(f1.reshape(4, 32, 32), p1, rtol=1e-6,
                               atol=1e-6)


def test_predict_gat_folds_mae_matches_host_offdiag(rng):
    """The (F,)-scalar on-device fold evaluation (predict_gat_folds_mae)
    must equal the host off-diagonal MAE of the pulled prediction
    stacks, INCLUDING ragged folds: the padded va_idx rows (which
    duplicate subject 0) must be masked out of the mean."""
    from fcsr_tpu.train.gat_loop import (GATTrainConfig, init_gat,
                                         precompute_gat_features,
                                         predict_gat_folds,
                                         predict_gat_folds_mae)
    from fcsr_tpu.utils.transfer import device_put_fast

    cfg = GATTrainConfig(n_nodes=20, m_nodes=32, ks=(0.5,), dim=8,
                         drop_p=0.0)
    model, v0, _, _ = init_gat(cfg, jax.random.PRNGKey(0))
    _, v1, _, _ = init_gat(cfg, jax.random.PRNGKey(1))
    lr = np.stack([random_symmetric(rng, 20) for _ in range(5)])
    hr = np.stack([random_symmetric(rng, 32) for _ in range(5)])

    # ragged folds: sizes 3 and 2, padded to 3 with a duplicate of
    # subject 0 — exactly run_gat_cv_fast's padding scheme
    folds_va = [np.array([0, 1, 2]), np.array([3, 4])]
    va_idx = np.zeros((2, 3), np.int32)
    for j, va in enumerate(folds_va):
        va_idx[j, :len(va)] = va
    lr_d = device_put_fast(lr.astype(np.float32))
    hr_d = device_put_fast(hr.astype(np.float32))
    x_d = precompute_gat_features(lr, dim=cfg.dim)

    maes = np.asarray(predict_gat_folds_mae(
        model, [v0, v1], lr_d, x_d, va_idx, hr_d,
        [len(v) for v in folds_va]))

    preds_f = np.asarray(predict_gat_folds(model, [v0, v1], lr_d, x_d,
                                           va_idx))
    off = ~np.eye(32, dtype=bool)
    for j, va in enumerate(folds_va):
        host = float(np.abs(preds_f[j, :len(va)][:, off]
                            - hr[va][:, off]).mean())
        np.testing.assert_allclose(maes[j], host, rtol=1e-5, atol=1e-7)


def test_precompute_gat_features_disk_cache(tmp_path, monkeypatch, rng):
    """The SVD feature precompute's disk layer round-trips: a fresh
    process (simulated by clearing the in-process memo) reads the
    features back bit-identically, the hit really comes from the file
    (poisoned-file probe), and the kill switch bypasses the disk."""
    import os

    from fcsr_tpu.train import gat_loop
    from fcsr_tpu.utils import host_cache
    from tests.conftest import random_symmetric

    monkeypatch.setenv("FCSR_SPECTRAL_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("FCSR_NO_SPECTRAL_CACHE", raising=False)
    lr = np.stack([random_symmetric(rng, 12) for _ in range(3)])

    gat_loop._FEATURE_CACHE.clear()
    f1 = np.asarray(gat_loop.precompute_gat_features(lr, dim=4))
    files = [f for f in os.listdir(tmp_path) if f.startswith("gatfeat_")]
    assert len(files) == 1, files
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]

    gat_loop._FEATURE_CACHE.clear()
    f2 = np.asarray(gat_loop.precompute_gat_features(lr, dim=4))
    np.testing.assert_array_equal(f1, f2)

    # prove the second call reads the FILE: poison it and observe the
    # poisoned values come back on the next fresh-memo call
    path = os.path.join(str(tmp_path), files[0])
    host_cache.save(path, features=f1 + 1.0)
    gat_loop._FEATURE_CACHE.clear()
    f3 = np.asarray(gat_loop.precompute_gat_features(lr, dim=4))
    np.testing.assert_array_equal(f3, f1 + 1.0)

    # the kill switch bypasses the (poisoned) disk and recomputes
    monkeypatch.setenv("FCSR_NO_SPECTRAL_CACHE", "1")
    gat_loop._FEATURE_CACHE.clear()
    f4 = np.asarray(gat_loop.precompute_gat_features(lr, dim=4))
    np.testing.assert_array_equal(f4, f1)
    gat_loop._FEATURE_CACHE.clear()
