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
           "has_real_csvs", "matrix_size_for", "write_kaggle_csvs",
           "LR_DIM", "HR_DIM"]


def has_real_csvs(data_dir: Optional[str]) -> bool:
    """THE substitution rule: True iff ``load_or_synthesize(data_dir)``
    would load the real Kaggle CSVs instead of synthesizing. Entry
    points (bench.py, tools/family_bench.py) must use this rather than
    re-deriving the check — a drifted copy applies the wrong quality
    gate to the wrong dataset."""
    return bool(data_dir) and os.path.exists(
        os.path.join(data_dir, "lr_train.csv"))


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


def matrix_size_for(vec_len: int) -> int:
    """Node count n with n(n-1)/2 == vec_len (strict upper triangle).

    The reference hardcodes 160/268 (ref: utils/preprocessing.py:66);
    inferring from the row length keeps the real Kaggle path identical
    (12720 -> 160, 35778 -> 268) while letting reduced-size CSVs run the
    SAME ingestion code end-to-end in CI."""
    n = int(round((1 + (1 + 8 * vec_len) ** 0.5) / 2))
    if n * (n - 1) // 2 != vec_len:
        raise ValueError(
            f"row length {vec_len} is not a strict-upper-triangle length")
    return n


_CSV_NAMES = ("lr_train.csv", "hr_train.csv", "lr_test.csv")


def _csv_fingerprint(data_dir: str) -> str:
    """Size+mtime fingerprint of the source CSVs — invalidates the npz
    cache when a CSV is edited or re-downloaded (a stale cache would
    silently serve arrays that no longer match the data on disk).

    A PARTIAL csv set fails loudly here: ``has_real_csvs`` triggers on
    ``lr_train.csv`` alone (silently synthesizing next to real data
    would be worse), so a half-copied data dir must produce a clear
    error naming the missing files, not a raw ``os.stat`` traceback."""
    missing = [n for n in _CSV_NAMES
               if not os.path.exists(os.path.join(data_dir, n))]
    if missing:
        raise FileNotFoundError(
            f"{data_dir} has lr_train.csv but is missing "
            f"{', '.join(missing)} — the Kaggle set needs all of "
            f"{', '.join(_CSV_NAMES)}")
    parts = []
    for name in _CSV_NAMES:
        path = os.path.join(data_dir, name)
        st = os.stat(path)
        parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    return "|".join(parts)


def load_dataset(data_dir: str, cache: bool = True) -> Dict[str, np.ndarray]:
    """Load {lr_train, hr_train, lr_test} as dense stacked arrays.

    Returns a dict with keys ``lr_train`` (N,160,160), ``hr_train``
    (N,268,268), ``lr_test`` (M,160,160).  Caches the materialized arrays in
    ``<data_dir>/fcsr_cache.npz``, fingerprinted against the source CSVs'
    size+mtime (stale caches are regenerated, not served).
    """
    cache_path = os.path.join(data_dir, "fcsr_cache.npz")
    fp = _csv_fingerprint(data_dir)
    if cache and os.path.exists(cache_path):
        with np.load(cache_path) as z:
            if "_fingerprint" in z.files and str(z["_fingerprint"]) == fp:
                return {k: z[k] for k in z.files if k != "_fingerprint"}
    vecs = {name[:-4]: load_csv_vectors(os.path.join(data_dir, name))
            for name in _CSV_NAMES}
    # sizes inferred from the row lengths (160/268 for the real Kaggle
    # files); lr_test must match lr_train's resolution
    lr_dim = matrix_size_for(vecs["lr_train"].shape[1])
    hr_dim = matrix_size_for(vecs["hr_train"].shape[1])
    if vecs["lr_test"].shape[1] != vecs["lr_train"].shape[1]:
        raise ValueError("lr_test.csv row length differs from lr_train.csv")
    out = {
        "lr_train": _to_matrices(vecs["lr_train"], lr_dim),
        "hr_train": _to_matrices(vecs["hr_train"], hr_dim),
        "lr_test": _to_matrices(vecs["lr_test"], lr_dim),
    }
    if cache:
        try:
            np.savez_compressed(cache_path, _fingerprint=fp, **out)
        except OSError:
            pass
    return out


def write_kaggle_csvs(data: Dict[str, np.ndarray], out_dir: str,
                      nan_frac: float = 0.001, seed: int = 0) -> None:
    """Emit a dataset dict as Kaggle-schema CSVs that ``load_dataset``
    (and the reference's ``extract_data``, ref: utils/preprocessing.py:
    35-75) ingest identically: one row per subject, a leading 1-based
    ``ID`` column, strict-upper-triangle values in ROW-MAJOR order (the
    ordering ``MatrixVectorizer.anti_vectorize`` inverts, ref:
    utils/matrix_vectorizer.py:74-88), and a deterministic sprinkle of
    NaN cells exercising the NaN->0 rule (ref: utils/preprocessing.py:
    63). Used to run the real-CSV branch of the pipeline (native C++
    parser -> batched anti-vectorize -> quality gates) before the
    private challenge data is available."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for name in _CSV_NAMES:
        mats = np.asarray(data[name[:-4]], dtype=np.float32)
        n = mats.shape[-1]
        iu = np.triu_indices(n, k=1)
        vecs = mats[:, iu[0], iu[1]].astype(np.float64)
        if nan_frac > 0:
            mask = rng.random(vecs.shape) < nan_frac
            vecs[mask] = np.nan
        header = "ID," + ",".join(f"v{j}" for j in range(vecs.shape[1]))
        ids = np.arange(1, len(vecs) + 1, dtype=np.float64)[:, None]
        np.savetxt(os.path.join(out_dir, name),
                   np.concatenate([ids, vecs], axis=1),
                   delimiter=",", header=header, comments="",
                   fmt="%.9g")


def load_or_synthesize(data_dir: Optional[str] = None,
                       n_train: int = 167, n_test: int = 112,
                       seed: int = 42,
                       flavor: str = "teacher") -> Dict[str, np.ndarray]:
    """Load the real Kaggle CSVs when present, else a seeded synthetic set
    with identical shapes/statistics (for benches and CI where the private
    challenge data is unavailable).

    ``flavor``: "teacher" (default — HR generated by a hidden teacher in
    GSR-Net's realizable family, quality-sensitive; see data/synthetic.py)
    or "lift" (the v1 soft-parcellation lift).
    """
    if has_real_csvs(data_dir):
        return load_dataset(data_dir)

    cache_path = None
    if data_dir:
        # v2: test subjects share the train parcellation (the old
        # separately-seeded draw put them out of distribution)
        cache_path = os.path.join(
            data_dir, f"fcsr_synth2_{flavor}_{seed}_{n_train}_{n_test}.npz")
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                return {k: z[k] for k in z.files}

    if flavor == "teacher":
        from fcsr_tpu.data.synthetic import synthesize_teacher_connectomes
        synth = synthesize_teacher_connectomes
    else:
        from fcsr_tpu.data.synthetic import synthesize_paired_connectomes
        synth = synthesize_paired_connectomes
    lr, hr, lr_test = synth(n_train, seed=seed, n_test=n_test)
    out = {"lr_train": lr, "hr_train": hr, "lr_test": lr_test}
    if cache_path:
        try:
            os.makedirs(data_dir, exist_ok=True)
            np.savez(cache_path, **out)
        except OSError:
            pass
    return out
