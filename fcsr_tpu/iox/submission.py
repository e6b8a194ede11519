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

__all__ = ["submission_frame", "save_prediction"]


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
