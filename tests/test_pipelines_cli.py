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
