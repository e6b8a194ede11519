"""Dataset I/O: CSV ingestion, npz caching, dense-matrix materialization.

The reference loads vectorized connectomes from Kaggle CSVs
(``lr_train.csv`` / ``hr_train.csv`` / ``lr_test.csv``) and anti-vectorizes
them one row at a time in Python loops (ref: utils/preprocessing.py:35-113,
utils/slim.py:44-82).  Here the whole dataset is anti-vectorized as ONE
batched scatter and cached as ``.npz`` (the reference caches ``.pt``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from fcsr_tpu.core.vectorize import anti_vectorize_batch

LR_DIM = 160
HR_DIM = 268

__all__ = ["load_csv_vectors", "load_dataset", "load_or_synthesize",
           "LR_DIM", "HR_DIM"]


def load_csv_vectors(csv_path: str) -> np.ndarray:
    """CSV of vectorized connectomes -> (N, V) float32; drops a leading
    ID/index column and maps NaN -> 0 (ref: utils/preprocessing.py:52-63).

    Primary path is the native multi-threaded C++ parser
    (fcsr_tpu/native/fast_csv.cpp); falls back to pandas, then numpy."""
    with open(csv_path) as f:
        header = f.readline().strip().split(",")
    skip_first = header[0].strip().strip('"') in ("", "Unnamed: 0", "ID")

    try:
        from fcsr_tpu.native import fast_csv_available, read_csv_float32
        if fast_csv_available():
            return read_csv_float32(csv_path, skip_first)
    except Exception:  # pragma: no cover - toolchain-dependent
        pass

    try:
        import pandas as pd
        df = pd.read_csv(csv_path)
        if skip_first:
            df = df.iloc[:, 1:]
        data = df.to_numpy(dtype=np.float32)
    except ImportError:  # pragma: no cover - pandas is normally present
        data = np.loadtxt(csv_path, delimiter=",", skiprows=1,
                          dtype=np.float32,
                          usecols=range(1 if skip_first else 0,
                                        len(header)))
    return np.nan_to_num(data, nan=0.0)


def _to_matrices(vectors: np.ndarray, size: int) -> np.ndarray:
    """Batched anti-vectorize (row-major ordering, matching the reference's
    data path) to dense (N, size, size) float32."""
    return np.asarray(anti_vectorize_batch(vectors.astype(np.float32), size))


def load_dataset(data_dir: str, cache: bool = True) -> Dict[str, np.ndarray]:
    """Load {lr_train, hr_train, lr_test} as dense stacked arrays.

    Returns a dict with keys ``lr_train`` (N,160,160), ``hr_train``
    (N,268,268), ``lr_test`` (M,160,160).  Caches the materialized arrays in
    ``<data_dir>/fcsr_cache.npz``.
    """
    cache_path = os.path.join(data_dir, "fcsr_cache.npz")
    if cache and os.path.exists(cache_path):
        with np.load(cache_path) as z:
            return {k: z[k] for k in z.files}
    out = {
        "lr_train": _to_matrices(
            load_csv_vectors(os.path.join(data_dir, "lr_train.csv")), LR_DIM),
        "hr_train": _to_matrices(
            load_csv_vectors(os.path.join(data_dir, "hr_train.csv")), HR_DIM),
        "lr_test": _to_matrices(
            load_csv_vectors(os.path.join(data_dir, "lr_test.csv")), LR_DIM),
    }
    if cache:
        try:
            np.savez_compressed(cache_path, **out)
        except OSError:
            pass
    return out


def load_or_synthesize(data_dir: Optional[str] = None,
                       n_train: int = 167, n_test: int = 112,
                       seed: int = 42) -> Dict[str, np.ndarray]:
    """Load the real Kaggle CSVs when present, else a seeded synthetic set
    with identical shapes/statistics (for benches and CI where the private
    challenge data is unavailable)."""
    if data_dir and os.path.exists(os.path.join(data_dir, "lr_train.csv")):
        return load_dataset(data_dir)
    from fcsr_tpu.data.synthetic import synthesize_paired_connectomes
    lr, hr = synthesize_paired_connectomes(n_train, seed=seed)
    lr_test, _ = synthesize_paired_connectomes(n_test, seed=seed + 1)
    return {"lr_train": lr, "hr_train": hr, "lr_test": lr_test}
