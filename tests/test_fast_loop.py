"""The fold-parallel flat-Adam trainer must match the parity trainer's
per-fold trajectory exactly (up to float reassociation)."""

import jax
import numpy as np

from fcsr_tpu.data import load_or_synthesize
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import (
    GSRTrainConfig,
    init_gsr,
    train_gsr_fold,
)
from fcsr_tpu.train.fast_loop import (
    evaluate_gsr_folds,
    train_gsr_folds_parallel,
)

CFG = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32, ks=(0.9, 0.7),
                     epochs=5)


def _small_data():
    d = load_or_synthesize(None, n_train=9, n_test=2)
    return (d["lr_train"][:, :20, :20].copy(),
            d["hr_train"][:, :32, :32].copy())


def test_fast_matches_parity_per_fold():
    lr, hr = _small_data()
    folds = kfold_indices(9, 3, seed=42)
    model, pf, loss_hist, err_hist, spec = train_gsr_folds_parallel(
        CFG, lr, hr, folds, init_seed=0)
    assert loss_hist.shape == (3, CFG.epochs)

    for j in [0, 2]:  # folds of different sizes exercise the masking
        model2, params, tx, opt = init_gsr(CFG, jax.random.PRNGKey(j))
        tr, _ = folds[j]
        params, opt, hist = train_gsr_fold(params, opt, model2, tx, CFG,
                                           lr[tr], hr[tr])
        np.testing.assert_allclose(loss_hist[j], hist["loss"], atol=1e-5)


def test_fast_eval_matches_parity_eval():
    from fcsr_tpu.train import evaluate_gsr
    lr, hr = _small_data()
    folds = kfold_indices(9, 3, seed=42)
    model, pf, _, _, spec = train_gsr_folds_parallel(CFG, lr, hr, folds,
                                                     init_seed=0)
    fold_maes, outs = evaluate_gsr_folds(CFG, pf, lr, hr, folds, spec)
    for j in range(3):
        _, va = folds[j]
        mae_ref, preds_ref, _ = evaluate_gsr(pf[j], model, CFG,
                                             lr[va], hr[va])
        np.testing.assert_allclose(fold_maes[j], mae_ref, atol=1e-5)
        np.testing.assert_allclose(outs[j][0], preds_ref, atol=1e-5)
