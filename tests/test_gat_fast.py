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
