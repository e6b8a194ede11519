"""Disk cache for host-LAPACK preprocessing artifacts.

The GSR spectral bases (train/gsr_loop.py::precompute_spectral) and the
GAT SVD node features (train/gat_loop.py::precompute_gat_features) are
pure functions of the dataset content — the reference itself caches its
preprocessed tensors on disk for the same reason (ref:
utils/slim.py:79-82). On a fast host they cost a few seconds; on a
single-vCPU VM the full-set LAPACK passes cost 25-54 s (spectral) /
~5 s (SVD) PER PROCESS, so fresh-process cold starts win them back from
one ~1-50 MB npz read.

Keys are content hashes (blake2b over shape + dtype + bytes, hashed
through the buffer protocol — ``.tobytes()`` would copy, and large host
copies run at ~120 MB/s on this VM). One switch governs every host
precompute cache: disable with ``FCSR_NO_SPECTRAL_CACHE=1``, relocate
with ``FCSR_SPECTRAL_CACHE_DIR`` (default ``~/.cache/fcsr_spectral``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

__all__ = ["cache_path", "load", "save"]


def cache_path(kind: str, arrays, extra=()):
    """Cache file path for artifact ``kind`` keyed by the CONTENT of
    ``arrays`` plus the hashable config tuple ``extra`` — or None when
    caching is disabled or the cache dir cannot be created."""
    if os.environ.get("FCSR_NO_SPECTRAL_CACHE") == "1":
        return None
    h = hashlib.blake2b(digest_size=16)
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(memoryview(a).cast("B"))
    h.update(repr(tuple(extra)).encode())
    root = os.environ.get(
        "FCSR_SPECTRAL_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "fcsr_spectral"))
    try:
        os.makedirs(root, exist_ok=True)
    except OSError:
        return None
    return os.path.join(root, f"{kind}_{h.hexdigest()}.npz")


def load(path, names):
    """Tuple of the named arrays from ``path``, or None on any miss
    (no path, missing file, unreadable/partial file — recompute then)."""
    if path is None or not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return tuple(z[n] for n in names)
    except Exception:
        return None


def save(path, **arrays):
    """Atomically install ``arrays`` at ``path`` (best-effort: a failed
    write just means the next process recomputes)."""
    if path is None:
        return
    # np.savez APPENDS .npz to names that lack it — keep the tmp name
    # .npz-suffixed so os.replace sees the file savez actually wrote.
    # Per-writer (pid) tmp name so two processes cold-starting on the
    # same dataset never install each other's partial write.
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    except OSError:
        pass
