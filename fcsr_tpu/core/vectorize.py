"""Symmetric-matrix <-> upper-triangular-vector transforms.

The reference pipeline uses THREE distinct orderings of the strict upper
triangle, and submission/leaderboard correctness depends on pairing them
exactly as the reference does (ref: utils/matrix_vectorizer.py:24-95,
training_gsr.ipynb cell-7):

  1. *column-major* ``vectorize``: traverse columns, within each column the
     rows above the diagonal in increasing order (pairs sorted by
     ``(col, row)``).  Optionally interleaves the first sub-diagonal element
     ``(col+1, col)`` after the column's upper-triangle block.
  2. *row-major* ``anti_vectorize``: fill via ``triu_indices`` ordering
     (pairs sorted by ``(row, col)``).  NOTE: 1. and 2. are NOT inverses of
     each other — the reference pairs them like this on purpose (its
     vectorized CSVs are consumed with the row-major layout and its
     submissions are emitted with the column-major one).
  3. *row-major flatten* via ``np.triu_indices(n, k=1)`` — used by the GSR
     notebook's submission writer.

Instead of the reference's O(n^2) Python double loops, we precompute the
index maps once per (n, include_diagonal) and use batched gathers/scatters,
which XLA lowers to single fused kernels on TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "vec_len",
    "triu_indices_colmajor",
    "triu_indices_rowmajor",
    "vectorize",
    "vectorize_rowmajor",
    "anti_vectorize",
    "vectorize_batch",
    "anti_vectorize_batch",
    "MatrixVectorizer",
]


def vec_len(n: int, include_diagonal: bool = False,
            ordering: str = "rowmajor") -> int:
    """Length of the vectorized form of an n x n symmetric matrix.

    The two orderings disagree when ``include_diagonal``: the column-major
    form interleaves one sub-diagonal element per column except the last
    (pair (col+1, col) requires col+1 < n -> n-1 extras, ref:
    utils/matrix_vectorizer.py:52-57), while the row-major anti-vectorize
    layout appends all n true-diagonal entries (ref:
    utils/matrix_vectorizer.py:90-95).
    """
    base = n * (n - 1) // 2
    if not include_diagonal:
        return base
    if ordering == "colmajor":
        return base + n - 1
    if ordering == "rowmajor":
        return base + n
    raise ValueError(f"unknown ordering {ordering!r}")


@functools.lru_cache(maxsize=None)
def triu_indices_colmajor(n: int, include_diagonal: bool = False):
    """(rows, cols) of the strict upper triangle in the reference's
    column-major traversal order (ref: utils/matrix_vectorizer.py:47-57).

    With ``include_diagonal`` the first sub-diagonal element ``(col+1, col)``
    is interleaved after each column's upper-triangle block, exactly as the
    reference's double loop emits it.
    """
    rows, cols = [], []
    for col in range(n):
        for row in range(col):
            rows.append(row)
            cols.append(col)
        if include_diagonal and col + 1 < n:
            rows.append(col + 1)
            cols.append(col)
    return np.asarray(rows, dtype=np.int32), np.asarray(cols, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def triu_indices_rowmajor(n: int):
    """(rows, cols) of the strict upper triangle in row-major
    (``triu_indices``) order (ref: utils/matrix_vectorizer.py:74)."""
    r, c = np.triu_indices(n, k=1)
    return r.astype(np.int32), c.astype(np.int32)


# ---------------------------------------------------------------------------
# Single-matrix transforms (thin wrappers over the batched ones)
# ---------------------------------------------------------------------------

def vectorize(matrix, include_diagonal: bool = False):
    """Column-major vectorize of one symmetric matrix -> 1-D array.

    Drop-in for the reference's ``MatrixVectorizer.vectorize``
    (ref: utils/matrix_vectorizer.py:24-58) without the Python loop.
    """
    matrix = jnp.asarray(matrix)
    rows, cols = triu_indices_colmajor(matrix.shape[-1], include_diagonal)
    return matrix[..., rows, cols]


def vectorize_rowmajor(matrix, include_diagonal: bool = False):
    """Row-major (triu_indices) flatten — the ordering used by the GSR
    notebook submission writer (ref: training_gsr.ipynb cell-7)."""
    matrix = jnp.asarray(matrix)
    rows, cols = triu_indices_rowmajor(matrix.shape[-1])
    v = matrix[..., rows, cols]
    if include_diagonal:
        d = jnp.diagonal(matrix, axis1=-2, axis2=-1)
        v = jnp.concatenate([v, d], axis=-1)
    return v


def anti_vectorize(vector, matrix_size: int, include_diagonal: bool = False):
    """Row-major anti-vectorize: 1-D array -> symmetric matrix.

    Matches the reference's ``MatrixVectorizer.anti_vectorize``
    (ref: utils/matrix_vectorizer.py:61-95): row-major ``triu_indices``
    ordering, zero diagonal unless ``include_diagonal`` (in which case the
    trailing ``matrix_size`` entries fill the true diagonal).
    """
    vector = jnp.asarray(vector)
    return anti_vectorize_batch(vector[None], matrix_size, include_diagonal)[0]


# ---------------------------------------------------------------------------
# Batched transforms (the TPU-native primitives)
# ---------------------------------------------------------------------------

def vectorize_batch(matrices, include_diagonal: bool = False):
    """(B, n, n) -> (B, L) column-major vectorize as one gather."""
    matrices = jnp.asarray(matrices)
    rows, cols = triu_indices_colmajor(matrices.shape[-1], include_diagonal)
    return matrices[..., rows, cols]


def anti_vectorize_batch(vectors, matrix_size: int,
                         include_diagonal: bool = False):
    """(B, L) -> (B, n, n) symmetric matrices via one scatter + transpose.

    Extra trailing entries in ``vectors`` beyond the required length are
    ignored, mirroring the reference's ``vector[:n_elements]`` slicing.
    """
    vectors = jnp.asarray(vectors)
    n = matrix_size
    rows, cols = triu_indices_rowmajor(n)
    m = n * (n - 1) // 2
    tri = vectors[..., :m]
    batch_shape = vectors.shape[:-1]
    out = jnp.zeros(batch_shape + (n, n), dtype=vectors.dtype)
    out = out.at[..., rows, cols].set(tri)
    out = out + jnp.swapaxes(out, -1, -2)
    if include_diagonal:
        diag = vectors[..., m:m + n]
        didx = np.arange(n)
        out = out.at[..., didx, didx].set(diag)
    return out


class MatrixVectorizer:
    """API-compatible facade over the functional transforms.

    Mirrors the reference class surface (ref: utils/matrix_vectorizer.py:5)
    so downstream code written against it ports over unchanged; internally
    everything is index-map gathers, no Python loops.
    """

    @staticmethod
    def vectorize(matrix, include_diagonal: bool = False):
        return np.asarray(vectorize(matrix, include_diagonal))

    @staticmethod
    def anti_vectorize(vector, matrix_size: int,
                       include_diagonal: bool = False):
        return np.asarray(anti_vectorize(np.asarray(vector, dtype=np.float32),
                                         matrix_size, include_diagonal))
