"""Device-resident ingestion pipeline.

End-to-end path: CSV (native C++ parser) -> flat-staged transfer of the
RAW VECTORS (half the bytes of dense matrices) -> fused Pallas
anti-vectorize(+normalize) kernel materializes the dense stacks directly
in HBM. This is the production ingestion path for TPU runs; the host path
(data/io.py) remains for CPU work and for feeding host LAPACK.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from fcsr_tpu.core.pallas_kernels import anti_vectorize_normalize
from fcsr_tpu.data.io import load_csv_vectors, matrix_size_for
from fcsr_tpu.utils.transfer import device_put_fast

__all__ = ["ingest_vectors_to_device", "load_dataset_device"]


def ingest_vectors_to_device(vectors: np.ndarray, n: int,
                             normalize: bool = False,
                             interpret: bool = False):
    """(B, V) host vectors -> (B, n, n) device-resident dense stacks via
    the fused Pallas kernel; only the vectors cross the host<->device
    link."""
    staged = device_put_fast(np.asarray(vectors, dtype=np.float32))
    return anti_vectorize_normalize(staged, n, normalize=normalize,
                                    interpret=interpret)


def load_dataset_device(data_dir: str, normalize_lr: bool = False,
                        interpret: bool = False) -> Dict[str, object]:
    """Kaggle CSVs -> device-resident dense stacks.

    Returns {lr_train, hr_train, lr_test} as device arrays; with
    ``normalize_lr`` the LR stacks come out degree-normalized (what GSRNet
    consumes), fused in the same kernel pass."""
    out = {}
    for name, norm in (("lr_train", normalize_lr),
                       ("hr_train", False),
                       ("lr_test", normalize_lr)):
        path = os.path.join(data_dir, f"{name}.csv")
        vecs = load_csv_vectors(path)
        # size inferred from the row length, like data/io.py::load_dataset
        # (160/268 for the real Kaggle files)
        n = matrix_size_for(vecs.shape[1])
        out[name] = ingest_vectors_to_device(vecs, n, normalize=norm,
                                             interpret=interpret)
    return out
