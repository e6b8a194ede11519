"""Tests for adjacency normalization / padding primitives
(ref semantics: utils/preprocessing.py, unet-transformer.py:31-45)."""

import numpy as np
import pytest

from fcsr_tpu.core import (
    fill_diagonal,
    normalize_adj,
    pad_hr_adj,
    symmetric_normalize,
    symmetrize,
    unpad,
)
from tests.conftest import random_symmetric


def naive_normalize(mx):
    rowsum = mx.sum(1)
    with np.errstate(divide="ignore"):
        r = rowsum ** -0.5
    r[np.isinf(r)] = 0.0
    d = np.diag(r)
    out = mx @ d
    out = out.T
    out = out @ d
    return out


@pytest.mark.parametrize("n", [8, 160])
def test_normalize_adj_matches_naive(rng, n):
    a = random_symmetric(rng, n)
    got = np.asarray(normalize_adj(a))
    np.testing.assert_allclose(got, naive_normalize(a), atol=1e-5)


def test_normalize_adj_zero_row_guard(rng):
    a = random_symmetric(rng, 10)
    a[3, :] = 0.0
    a[:, 3] = 0.0
    got = np.asarray(normalize_adj(a))
    assert np.all(np.isfinite(got))
    assert np.all(got[3] == 0)


def test_symmetric_normalize_matches_naive(rng):
    n = 32
    a = random_symmetric(rng, n) + np.eye(n, dtype=np.float32)
    d = a.sum(1) + 1e-5
    dinv = np.diag(d ** -0.5)
    want = dinv @ a @ dinv
    np.testing.assert_allclose(np.asarray(symmetric_normalize(a)), want,
                               atol=1e-5)


def test_pad_unpad_roundtrip(rng):
    a = random_symmetric(rng, 12)
    p = np.asarray(pad_hr_adj(a, 3))
    assert p.shape == (18, 18)
    assert np.all(np.diag(p) == 1.0)
    assert np.all(p[:3, 3:] == 0)
    # off-diagonal interior is preserved; diagonal was overwritten to 1
    inner = np.asarray(unpad(p, 3))
    mask = ~np.eye(12, dtype=bool)
    np.testing.assert_array_equal(inner[mask], a[mask])


def test_pad_zero_split_sets_diag(rng):
    a = random_symmetric(rng, 6)
    p = np.asarray(pad_hr_adj(a, 0))
    assert p.shape == (6, 6)
    assert np.all(np.diag(p) == 1.0)


def test_fill_diagonal_and_symmetrize(rng):
    a = rng.random((5, 5)).astype(np.float32)
    f = np.asarray(fill_diagonal(a, 7.0))
    assert np.all(np.diag(f) == 7.0)
    s = np.asarray(symmetrize(a))
    np.testing.assert_allclose(s, (a + a.T) / 2, atol=1e-7)


def test_batched_broadcasting(rng):
    b = np.stack([random_symmetric(rng, 9) for _ in range(4)])
    got = np.asarray(normalize_adj(b))
    for i in range(4):
        np.testing.assert_allclose(got[i], naive_normalize(b[i]), atol=1e-5)
