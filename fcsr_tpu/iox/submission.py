"""Kaggle submission writer.

Two vectorization orderings coexist in the reference and produce different
CSVs — both are supported and must be chosen to match the consuming
pipeline:

  * ``ordering="colmajor"`` — ``MatrixVectorizer.vectorize`` order, used by
    the PyG/MLP and unet paths (ref: utils/data.py:212-233,
    unet-transformer.py:448-457).
  * ``ordering="rowmajor"`` — ``np.triu_indices(268, k=1)`` flatten, used by
    the GSR notebook (ref: training_gsr.ipynb cell-7).
"""

from __future__ import annotations

import numpy as np

from fcsr_tpu.core.vectorize import vectorize_batch, vectorize_rowmajor

__all__ = ["submission_frame", "save_prediction", "kaggle_submit",
           "DEFAULT_COMPETITION"]

# the challenge both entry notebooks submit to
# (ref: training_gsr.ipynb cell-9, training_template.ipynb last cell)
DEFAULT_COMPETITION = "dgl-2025-brain-graph-super-resolution-challenge"


def _vectorize(preds: np.ndarray, ordering: str) -> np.ndarray:
    if ordering == "colmajor":
        return np.asarray(vectorize_batch(preds))
    if ordering == "rowmajor":
        return np.asarray(vectorize_rowmajor(preds))
    raise ValueError(f"unknown ordering: {ordering}")


def submission_frame(preds, ordering: str = "colmajor"):
    """(B, n, n) predictions -> pandas DataFrame with 1-based ``ID`` and
    ``Predicted`` columns (ref: utils/data.py:229-233)."""
    import pandas as pd
    flat = _vectorize(np.asarray(preds), ordering).reshape(-1)
    return pd.DataFrame({"ID": np.arange(1, len(flat) + 1),
                         "Predicted": flat})


def save_prediction(preds, output_file: str, ordering: str = "colmajor"):
    """Write the submission CSV; returns the flattened prediction vector."""
    df = submission_frame(preds, ordering)
    df.to_csv(output_file, index=False)
    return df["Predicted"].to_numpy()


def kaggle_submit(csv_path: str, message: str,
                  competition: str = DEFAULT_COMPETITION,
                  dry_run: bool = False):
    """Submit a written CSV to the Kaggle challenge via the ``kaggle`` CLI
    (ref: training_gsr.ipynb cell-9 / training_template.ipynb last cell).

    Requires the ``kaggle`` CLI and ``~/.kaggle/kaggle.json`` credentials
    on the host; ``dry_run=True`` (or a missing CLI) prints the exact
    command instead so it can be run where credentials live. Returns the
    CLI's exit code (0 on success or dry run)."""
    import shlex
    import shutil
    import subprocess

    cmd = ["kaggle", "competitions", "submit", "-c", competition,
           "-f", csv_path, "-m", message]
    if dry_run or shutil.which("kaggle") is None:
        # shlex.join: the printed command must survive copy-paste even
        # when the message contains spaces/quotes
        print("kaggle CLI not invoked"
              + (" (dry run)" if dry_run else " (CLI not installed)")
              + "; run:\n  " + shlex.join(cmd))
        return 0
    return subprocess.call(cmd)
