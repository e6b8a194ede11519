"""Plot artifacts (evalx/plots.py) — the loss.png / 3fold_vis bar
equivalents must actually render files (ref: outputs/*/loss.png,
3fold_vis.ipynb)."""

import os

import pytest

matplotlib = pytest.importorskip("matplotlib")

from fcsr_tpu.evalx.plots import save_fold_comparison, save_loss_curve


def test_save_loss_curve(tmp_path):
    p = save_loss_curve([1.0, 0.5, 0.3], str(tmp_path / "sub" / "loss.png"),
                        val_hist=[1.1, 0.6, 0.4])
    assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_save_fold_comparison(tmp_path):
    fm = {"gsr": [{"mae": 0.14, "pcc": 0.58}, {"mae": 0.15, "pcc": 0.57}],
          "mlp": [{"mae": 0.25, "pcc": 0.39}, {"mae": 0.24, "pcc": 0.40}]}
    paths = save_fold_comparison(fm, str(tmp_path), metrics=["mae", "pcc"])
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000
