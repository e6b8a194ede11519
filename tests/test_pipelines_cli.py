"""End-to-end pipeline + CLI smoke tests on tiny synthetic data."""

import json
import os

import numpy as np
import pytest

from fcsr_tpu.data import load_or_synthesize


@pytest.fixture(scope="module")
def tiny_data():
    return load_or_synthesize(None, n_train=9, n_test=3, seed=1)


@pytest.mark.slow
def test_run_mlp_cv(tiny_data):
    from fcsr_tpu.pipelines import run_mlp_cv
    result = run_mlp_cv(tiny_data, k_folds=2, p_val=0.3, num_epochs=2,
                        batch_size=4)
    assert result["test_preds"].shape == (3, 268, 268)
    assert len(result["histories"]) == 2


@pytest.mark.slow
def test_run_gat_cv(tiny_data):
    from fcsr_tpu.pipelines import run_gat_cv
    from fcsr_tpu.train.gat_loop import GATTrainConfig
    cfg = GATTrainConfig(ks=(0.5, 0.5), dim=8, heads=2, epochs=2)
    result = run_gat_cv(tiny_data, splits=2, cfg=cfg)
    assert result["test_preds"].shape == (3, 268, 268)


@pytest.mark.slow
def test_cli_train_gsr_fast(tmp_path, monkeypatch, tiny_data):
    """CLI gsr --fast end-to-end with synthetic data + submission files."""
    from fcsr_tpu import cli
    # point the data dir somewhere empty -> synthetic fallback (full-size
    # data is too slow for unit tests, so shrink via monkeypatched loader)
    import fcsr_tpu.data as data_mod

    monkeypatch.setattr(data_mod, "load_or_synthesize",
                        lambda *a, **k: tiny_data)
    monkeypatch.setattr("fcsr_tpu.cli._load_data",
                        lambda args: tiny_data)
    from fcsr_tpu.train import GSRTrainConfig
    rc = cli.main(["train", "gsr", "--fast", "--splits", "2",
                   "--epochs", "2", "--out-dir", str(tmp_path)])
    assert rc == 0
    sub = tmp_path / "submission.csv"
    assert sub.exists()
    import pandas as pd
    df = pd.read_csv(sub)
    assert list(df.columns) == ["ID", "Predicted"]
    assert len(df) == 3 * (268 * 267 // 2)


def test_cli_evaluate(tmp_path):
    from fcsr_tpu import cli
    from tests.conftest import random_symmetric
    rng = np.random.default_rng(0)
    gt = np.stack([random_symmetric(rng, 16, density=0.6) for _ in range(2)])
    np.savez(tmp_path / "gt.npz", gt=gt)
    np.savez(tmp_path / "pred.npz", pred=gt * 0.95)
    rc = cli.main(["evaluate", "--gt", str(tmp_path / "gt.npz"),
                   "--pred", str(tmp_path / "pred.npz"),
                   "--fold", "1", "--out-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "results_fold_1.txt").exists()


def test_mlp_ondevice_fold_eval_matches_host_offdiag_mae():
    """The pipeline's ONE-dispatch on-device fold evaluation
    (_mlp_fold_eval_program: triu-vector MAE of the vector-output model)
    must equal the host path's off-diagonal MATRIX MAE of the
    matrix-output model on the same variables: every off-diag |diff|
    appears exactly twice in both the numerator and denominator of the
    matrix mean, so the two means are the same quantity up to float
    reassociation."""
    import jax

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    from fcsr_tpu.models.mlp import SpectralResMLP
    from fcsr_tpu.pipelines import (_mlp_fold_eval_program,
                                    _model_predict_program)
    from fcsr_tpu.train.losses import pack_triu_targets
    from tests.conftest import random_symmetric

    n_in, n_out, n, F = 12, 16, 10, 3
    rng = np.random.default_rng(5)
    lr_all = np.stack([random_symmetric(rng, n_in, density=0.7)
                       for _ in range(n)]).astype(np.float32)
    hr_all = np.stack([random_symmetric(rng, n_out, density=0.7)
                       for _ in range(n)]).astype(np.float32)
    r_in, c_in = triu_indices_rowmajor(n_in)
    x = lr_all[:, r_in, c_in]
    y = pack_triu_targets(hr_all)

    kw = dict(num_nodes_input=n_in, num_nodes_output=n_out,
              num_hidden=8, n_layers=0)
    model_vec = SpectralResMLP(output="vector", **kw)
    model_mat = SpectralResMLP(**kw)
    inits = [model_vec.init({"params": jax.random.PRNGKey(j),
                             "dropout": jax.random.PRNGKey(10 + j)},
                            x[:2]) for j in range(F)]
    stack = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(v) for v in xs]), *inits)
    va_idx = np.stack([np.arange(j, j + 4, dtype=np.int32)
                       for j in range(F)])

    n_tri = (n_out * (n_out - 1)) // 2
    maes_dev = np.asarray(_mlp_fold_eval_program(model_vec)(
        stack, x, y, va_idx, n_tri))

    pred_fn = _model_predict_program(model_mat)
    off = ~np.eye(n_out, dtype=bool)
    for j in range(F):
        preds = np.asarray(pred_fn(inits[j], x[va_idx[j]]))
        mae_host = float(np.abs(preds[:, off]
                                - hr_all[va_idx[j]][:, off]).mean())
        np.testing.assert_allclose(maes_dev[j], mae_host,
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_mlp_v1_variant(tiny_data):
    from fcsr_tpu.pipelines import run_mlp_cv
    r = run_mlp_cv(tiny_data, k_folds=2, num_epochs=2, batch_size=4,
                   variant="v1", hidden=32, n_layers=1)
    assert r["test_preds"].shape == (3, 268, 268)


@pytest.mark.slow
def test_cli_predict_roundtrip(tmp_path, monkeypatch, tiny_data):
    """Save trained GSR params via the fast pipeline, reload through the
    predict subcommand, and get a valid submission."""
    import jax
    from fcsr_tpu import cli
    from fcsr_tpu.iox import save_pytree
    from fcsr_tpu.train import GSRTrainConfig, init_gsr

    cfg = GSRTrainConfig()
    model, params, _, _ = init_gsr(cfg, jax.random.PRNGKey(3))
    ppath = tmp_path / "params.msgpack"
    save_pytree(params, str(ppath))

    import fcsr_tpu.data as data_mod
    monkeypatch.setattr(data_mod, "load_or_synthesize",
                        lambda *a, **k: tiny_data)
    out = tmp_path / "sub.csv"
    rc = cli.main(["predict", "--params", str(ppath),
                   "--out", str(out), "--ordering", "rowmajor"])
    assert rc == 0
    import pandas as pd
    df = pd.read_csv(out)
    assert len(df) == 3 * (268 * 267 // 2)


def test_cli_submit_dry_run(tmp_path, capsys):
    """The submit subcommand mirrors the notebooks' kaggle CLI call
    (ref: training_gsr.ipynb cell-9); with --dry-run (or no kaggle CLI
    installed) it prints the exact command instead of invoking it."""
    from fcsr_tpu import cli

    csv = tmp_path / "submission.csv"
    csv.write_text("ID,Predicted\n1,0.5\n")
    rc = cli.main(["submit", "--csv", str(csv), "-m", "msg", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "kaggle competitions submit" in out
    assert "dgl-2025-brain-graph-super-resolution-challenge" in out
    # missing file is a clean error, not a kaggle invocation
    assert cli.main(["submit", "--csv", str(tmp_path / "nope.csv")]) == 2
