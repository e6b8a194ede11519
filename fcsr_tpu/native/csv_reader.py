"""ctypes binding for the native CSV parser (fast_csv.cpp).

Builds the shared library on first use with g++ (cached next to the
source; falls back to a user cache dir if the package is read-only) and
exposes ``read_csv_float32``. Callers should guard with
``fast_csv_available()`` and fall back to the pandas/numpy path — the
toolchain is present in the build image but may be absent downstream.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_csv.cpp")


def _src_tag() -> str:
    """Short content hash of fast_csv.cpp: the library filename embeds
    it, so a source fix forces a rebuild instead of silently loading a
    stale binary built from old code."""
    import hashlib
    with open(_SRC, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:10]


_LIB_NAME = f"libfcsr_csv_{_src_tag()}.so"

_lock = threading.Lock()
_lib = None
_build_failed = False

__all__ = ["fast_csv_available", "read_csv_float32"]


def _candidate_paths():
    yield os.path.join(_HERE, _LIB_NAME)
    cache = os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache"))
    yield os.path.join(cache, "fcsr_tpu", _LIB_NAME)


def _build(lib_path: str) -> bool:
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    # generic -O3 (no -march=native): the parser is strtod/memory bound,
    # and a natively-tuned binary in a shared cache dir SIGILLs when
    # loaded on a different CPU generation
    cmd = ["g++", "-O3", "-shared", "-fPIC",
           "-std=c++17", "-pthread", _SRC, "-o", lib_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        for path in _candidate_paths():
            if not os.path.exists(path):
                if not _build(path):
                    continue
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.fcsr_csv_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.fcsr_csv_dims.restype = ctypes.c_int
            lib.fcsr_csv_read.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64]
            lib.fcsr_csv_read.restype = ctypes.c_int
            _lib = lib
            return _lib
        _build_failed = True
        return None


def fast_csv_available() -> bool:
    return _load() is not None


def read_csv_float32(path: str, skip_first_col: bool) -> np.ndarray:
    """Parse a numeric CSV (header row dropped) into (rows, cols) float32;
    NaN/empty fields become 0. Raises RuntimeError if the native library
    is unavailable or parsing fails."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native CSV library unavailable")
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.fcsr_csv_dims(path.encode(), int(skip_first_col),
                           ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise RuntimeError(f"fcsr_csv_dims failed ({rc}) for {path}")
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    rc = lib.fcsr_csv_read(path.encode(), int(skip_first_col),
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_float)),
                           rows.value, cols.value)
    if rc != 0:
        raise RuntimeError(f"fcsr_csv_read failed ({rc}) for {path}")
    return out
