"""Golden tests for the (anti-)vectorizer against naive re-derivations of the
reference semantics (ref: utils/matrix_vectorizer.py)."""

import numpy as np
import pytest

from fcsr_tpu.core import (
    MatrixVectorizer,
    anti_vectorize,
    anti_vectorize_batch,
    vec_len,
    vectorize,
    vectorize_batch,
    vectorize_rowmajor,
)


def naive_vectorize_colmajor(matrix, include_diagonal=False):
    """Independent naive reimplementation of the documented column-major
    traversal: for each col, rows above the diagonal; optionally the first
    sub-diagonal element after them."""
    n = matrix.shape[0]
    out = []
    for col in range(n):
        for row in range(n):
            if row != col:
                if row < col:
                    out.append(matrix[row, col])
                elif include_diagonal and row == col + 1:
                    out.append(matrix[row, col])
    return np.array(out)


def naive_anti_vectorize_rowmajor(vector, n, include_diagonal=False):
    r, c = np.triu_indices(n, k=1)
    m = np.zeros((n, n), dtype=np.float64)
    k = len(r)
    m[r, c] = vector[:k]
    m[c, r] = vector[:k]
    if include_diagonal:
        np.fill_diagonal(m, vector[k:k + n])
    return m


@pytest.mark.parametrize("n", [4, 7, 160])
@pytest.mark.parametrize("include_diagonal", [False, True])
def test_vectorize_matches_naive(rng, n, include_diagonal):
    m = rng.random((n, n)).astype(np.float32)
    got = np.asarray(vectorize(m, include_diagonal))
    want = naive_vectorize_colmajor(m, include_diagonal)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 7, 160, 268])
def test_anti_vectorize_matches_naive(rng, n):
    v = rng.random(n * (n - 1) // 2).astype(np.float32)
    got = np.asarray(anti_vectorize(v, n))
    want = naive_anti_vectorize_rowmajor(v, n)
    np.testing.assert_allclose(got, want, atol=1e-7)
    # symmetric, zero diagonal
    np.testing.assert_array_equal(got, got.T)
    assert np.all(np.diag(got) == 0)


def test_anti_vectorize_include_diagonal(rng):
    n = 9
    v = rng.random(n * (n - 1) // 2 + n).astype(np.float32)
    got = np.asarray(anti_vectorize(v, n, include_diagonal=True))
    want = naive_anti_vectorize_rowmajor(v, n, include_diagonal=True)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_anti_vectorize_ignores_extra_trailing(rng):
    """The reference slices vector[:n_elements]; longer vectors are legal."""
    n = 6
    v = rng.random(n * n).astype(np.float32)
    got = np.asarray(anti_vectorize(v, n))
    want = naive_anti_vectorize_rowmajor(v, n)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_orderings_differ_but_values_roundtrip(rng):
    """Column-major vectorize and row-major anti-vectorize are NOT inverses
    elementwise (permuted order) but conserve the multiset of values —
    exactly as in the reference."""
    n = 12
    v = rng.random(n * (n - 1) // 2).astype(np.float32)
    m = np.asarray(anti_vectorize(v, n))
    v2 = np.asarray(vectorize(m))
    assert not np.array_equal(v, v2)  # permuted
    np.testing.assert_allclose(np.sort(v), np.sort(v2), atol=1e-7)
    # row-major vectorize IS the exact inverse of row-major anti-vectorize
    np.testing.assert_allclose(np.asarray(vectorize_rowmajor(m)), v, atol=1e-7)


def test_vectorize_rowmajor_matches_triu_flatten(rng):
    n = 20
    m = rng.random((n, n)).astype(np.float32)
    got = np.asarray(vectorize_rowmajor(m))
    want = m[np.triu_indices(n, k=1)]
    np.testing.assert_array_equal(got, want)


def test_batched_consistency(rng):
    n, b = 16, 5
    mats = rng.random((b, n, n)).astype(np.float32)
    vb = np.asarray(vectorize_batch(mats))
    for i in range(b):
        np.testing.assert_array_equal(vb[i], np.asarray(vectorize(mats[i])))
    ab = np.asarray(anti_vectorize_batch(vb, n))
    for i in range(b):
        np.testing.assert_allclose(
            ab[i], np.asarray(anti_vectorize(vb[i], n)), atol=1e-7)


def test_vec_len():
    assert vec_len(160) == 12720
    assert vec_len(268) == 35778


def test_vec_len_with_diagonal_matches_index_maps():
    # the two orderings emit DIFFERENT counts with include_diagonal; vec_len
    # must match the actual index maps / emitted vectors for both
    from fcsr_tpu.core.vectorize import (triu_indices_colmajor,
                                         triu_indices_rowmajor)
    for n in (5, 8, 160):
        rows, _ = triu_indices_colmajor(n, include_diagonal=True)
        assert vec_len(n, True, "colmajor") == len(rows)
        assert vec_len(n, True, "colmajor") == n * (n - 1) // 2 + n - 1
        rm = len(triu_indices_rowmajor(n)[0]) + n  # strict triu + n diagonal
        assert vec_len(n, True, "rowmajor") == rm
        m = np.arange(n * n, dtype=np.float32).reshape(n, n)
        m = (m + m.T) / 2
        assert len(np.asarray(vectorize(m, True))) == \
            vec_len(n, True, "colmajor")
        back = anti_vectorize(np.zeros(vec_len(n, True, "rowmajor"),
                                       np.float32), n, True)
        assert back.shape == (n, n)


def test_facade_class(rng):
    n = 8
    m = rng.random((n, n)).astype(np.float32)
    v = MatrixVectorizer.vectorize(m)
    assert isinstance(v, np.ndarray)
    back = MatrixVectorizer.anti_vectorize(
        naive_vectorize_colmajor(m).astype(np.float32), n)
    assert back.shape == (n, n)
