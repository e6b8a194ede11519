"""Plot artifacts (evalx/plots.py) — the loss.png / 3fold_vis bar
equivalents must actually render files (ref: outputs/*/loss.png,
3fold_vis.ipynb)."""

import os

import pytest

pytest.importorskip("matplotlib")

from fcsr_tpu.evalx.plots import save_fold_comparison, save_loss_curve


def test_save_loss_curve(tmp_path):
    p = save_loss_curve([1.0, 0.5, 0.3], str(tmp_path / "sub" / "loss.png"),
                        val_hist=[1.1, 0.6, 0.4])
    assert os.path.exists(p) and os.path.getsize(p) > 1000
    # train-only history (no val curve)
    p2 = save_loss_curve([1.0, 0.4], str(tmp_path / "loss2.png"))
    assert os.path.exists(p2) and os.path.getsize(p2) > 1000


def test_save_fold_comparison(tmp_path):
    # UNEVEN fold counts + a model missing one metric key: exercises the
    # truncation and NaN-fill branches the real 3fold_vis caller relies on
    fm = {"gsr": [{"mae": 0.14, "pcc": 0.58}, {"mae": 0.15, "pcc": 0.57},
                  {"mae": 0.15, "pcc": 0.59}],
          "mlp": [{"mae": 0.25}, {"mae": 0.24}]}
    paths = save_fold_comparison(fm, str(tmp_path), metrics=["mae", "pcc"])
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000
    # default metrics=None path (what examples/three_fold_vis.py uses)
    paths = save_fold_comparison(fm, str(tmp_path / "default"))
    assert len(paths) >= 8
