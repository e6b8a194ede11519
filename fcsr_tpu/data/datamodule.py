"""Split schemes and batch planning over stacked connectome arrays.

The reference has three split schemes; all are reproduced here over dense
stacked arrays (instead of Python lists of PyG graphs):

  * sklearn-style shuffled K-fold (ref: training_gsr.ipynb cell-4,
    unet-transformer.py:484) — ``kfold_indices`` replicates sklearn's
    ``KFold(shuffle=True, random_state=seed)`` exactly (validated in tests).
  * contiguous validation windows over ONE shared permutation
    (ref: utils/data.py:126-151) — ``contiguous_window_folds``.
  * single shuffled train/val split (ref: utils/slim.py:87-105) —
    ``train_val_split``.

Batching for scan-based training is planned host-side as integer index
arrays (``epoch_permutations``) so the whole multi-epoch loop can run as one
jitted ``lax.scan`` over device-resident data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["kfold_indices", "contiguous_window_folds", "train_val_split",
           "epoch_permutations", "ConnectomeDataModule"]


def kfold_indices(n: int, k: int, seed: Optional[int] = 42,
                  shuffle: bool = True) -> List[Tuple[np.ndarray, np.ndarray]]:
    """(train_idx, val_idx) per fold, bit-identical to sklearn's
    ``KFold(n_splits=k, shuffle=shuffle, random_state=seed).split(range(n))``.

    sklearn shuffles ``arange(n)`` with a ``RandomState(seed)`` and carves
    contiguous test windows of size ``n//k`` (+1 for the first ``n%k``
    folds); we re-derive that here without the sklearn dependency.
    """
    indices = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(indices)
    fold_sizes = np.full(k, n // k, dtype=int)
    fold_sizes[: n % k] += 1
    folds = []
    start = 0
    for size in fold_sizes:
        stop = start + size
        # sklearn materializes folds via boolean masks over arange(n), so its
        # emitted train/val arrays are sorted — match that exactly.
        val = np.sort(indices[start:stop])
        train = np.sort(np.concatenate([indices[:start], indices[stop:]]))
        folds.append((train, val))
        start = stop
    return folds


def contiguous_window_folds(n: int, k: int, p_val: float,
                            seed: int = 42) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Reference GraphDataModule folds: one shared random permutation, fold
    ``j`` takes the contiguous window ``[j*val_size, (j+1)*val_size)`` of it
    as validation (ref: utils/data.py:126-146).

    The reference draws the permutation from torch's global RNG; we use a
    seeded numpy Generator — same scheme, different (but reproducible) draw.
    """
    indices = np.random.default_rng(seed).permutation(n)
    val_size = int(n * p_val)
    folds = []
    for j in range(k):
        lo, hi = j * val_size, (j + 1) * val_size
        val = indices[lo:hi]
        train = np.concatenate([indices[:lo], indices[hi:]])
        folds.append((train, val))
    return folds


def train_val_split(n: int, p_val: float = 0.2,
                    seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """Single shuffled split: first (1-p_val) of a permutation is train
    (ref: utils/slim.py:87-91)."""
    indices = np.random.default_rng(seed).permutation(n)
    split = int(n * (1 - p_val))
    return indices[:split], indices[split:]


def epoch_permutations(n: int, num_epochs: int, seed: int = 0,
                       shuffle: bool = True) -> np.ndarray:
    """(num_epochs, n) int32 sample orders — the host-side batch plan that
    lets the full multi-epoch training loop live inside one lax.scan."""
    if not shuffle:
        return np.broadcast_to(np.arange(n, dtype=np.int32),
                               (num_epochs, n)).copy()
    rng = np.random.default_rng(seed)
    return np.stack([rng.permutation(n).astype(np.int32)
                     for _ in range(num_epochs)])


@dataclass
class ConnectomeDataModule:
    """Stacked-array data module: the TPU-native replacement for the
    reference's GraphDataModule / SLIMDataModule (lists of PyG graphs and
    per-sample loaders become single device-resident arrays).
    """

    lr_train: np.ndarray
    hr_train: np.ndarray
    lr_test: Optional[np.ndarray] = None
    folds: List[Tuple[np.ndarray, np.ndarray]] = field(default_factory=list)

    @classmethod
    def from_arrays(cls, data: Dict[str, np.ndarray], scheme: str = "kfold",
                    k: int = 3, p_val: float = 0.33, seed: int = 42):
        n = data["lr_train"].shape[0]
        if scheme == "kfold":
            folds = kfold_indices(n, k, seed=seed)
        elif scheme == "window":
            folds = contiguous_window_folds(n, k, p_val, seed=seed)
        elif scheme == "holdout":
            folds = [train_val_split(n, p_val, seed=seed)]
        else:
            raise ValueError(f"unknown split scheme: {scheme}")
        return cls(lr_train=data["lr_train"], hr_train=data["hr_train"],
                   lr_test=data.get("lr_test"), folds=folds)

    @property
    def n_folds(self) -> int:
        return len(self.folds)

    def fold_arrays(self, j: int):
        """(lr_tr, hr_tr, lr_val, hr_val) dense stacks for fold j."""
        tr, va = self.folds[j]
        return (self.lr_train[tr], self.hr_train[tr],
                self.lr_train[va], self.hr_train[va])

    def iter_folds(self) -> Iterator[Tuple[np.ndarray, ...]]:
        for j in range(self.n_folds):
            yield self.fold_arrays(j)
