"""Pallas kernel correctness vs the XLA reference implementations.

Runs in interpret mode on the CPU test platform; the same kernels compile
natively on TPU (exercised by bench/pipelines).
"""

import numpy as np
import pytest

from fcsr_tpu.core.normalize import normalize_adj
from fcsr_tpu.core.pallas_kernels import (
    anti_vectorize_normalize,
    normalize_adj_pallas,
)
from fcsr_tpu.core.vectorize import anti_vectorize_batch, vec_len


@pytest.mark.parametrize("n", [8, 33])
def test_antivec_kernel_matches_xla(rng, n):
    b = 3
    vecs = rng.random((b, vec_len(n))).astype(np.float32)
    got = np.asarray(anti_vectorize_normalize(vecs, n, normalize=False,
                                              interpret=True))
    want = np.asarray(anti_vectorize_batch(vecs, n))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n", [8, 33])
def test_antivec_normalize_fused(rng, n):
    b = 2
    vecs = rng.random((b, vec_len(n))).astype(np.float32)
    got = np.asarray(anti_vectorize_normalize(vecs, n, normalize=True,
                                              interpret=True))
    dense = np.asarray(anti_vectorize_batch(vecs, n))
    want = np.asarray(normalize_adj(dense))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_antivec_fill_diag(rng):
    n = 12
    vecs = rng.random((1, vec_len(n))).astype(np.float32)
    got = np.asarray(anti_vectorize_normalize(vecs, n, normalize=False,
                                              fill_diag=1.0,
                                              interpret=True))
    assert np.all(np.diag(got[0]) == 1.0)
    dense = np.asarray(anti_vectorize_batch(vecs, n))[0]
    off = ~np.eye(n, dtype=bool)
    np.testing.assert_allclose(got[0][off], dense[off], atol=1e-6)


def test_antivec_ignores_trailing(rng):
    n = 9
    vecs = rng.random((2, vec_len(n) + 7)).astype(np.float32)
    got = np.asarray(anti_vectorize_normalize(vecs, n, normalize=False,
                                              interpret=True))
    want = np.asarray(anti_vectorize_batch(vecs, n))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_normalize_kernel_matches_xla(rng):
    from tests.conftest import random_symmetric
    b = np.stack([random_symmetric(rng, 20) for _ in range(4)])
    b[2, 5, :] = 0.0
    b[2, :, 5] = 0.0  # zero-degree guard path
    got = np.asarray(normalize_adj_pallas(b, interpret=True))
    want = np.asarray(normalize_adj(b))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("n", [8, 33])
def test_vectorize_colmajor_kernel(rng, n):
    from fcsr_tpu.core.pallas_kernels import vectorize_colmajor_pallas
    from fcsr_tpu.core.vectorize import vectorize_batch
    mats = rng.random((3, n, n)).astype(np.float32)
    mats = (mats + mats.transpose(0, 2, 1)) / 2
    got = np.asarray(vectorize_colmajor_pallas(mats, interpret=True))
    want = np.asarray(vectorize_batch(mats))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_vectorize_antivectorize_kernel_roundtrip(rng):
    """rowmajor anti-vec kernel + colmajor vec kernel compose exactly like
    the reference's (non-inverse) ordering pair."""
    from fcsr_tpu.core.pallas_kernels import (anti_vectorize_normalize,
                                              vectorize_colmajor_pallas)
    from fcsr_tpu.core.vectorize import anti_vectorize_batch, vec_len, \
        vectorize_batch
    n = 16
    v = rng.random((2, vec_len(n))).astype(np.float32)
    dense = np.asarray(anti_vectorize_normalize(v, n, normalize=False,
                                                interpret=True))
    got = np.asarray(vectorize_colmajor_pallas(dense, interpret=True))
    want = np.asarray(vectorize_batch(anti_vectorize_batch(v, n)))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_normalize_guard_matches_xla_on_negative_rowsum():
    """The kernel's zero-degree guard must mirror normalize_adj exactly:
    a ZERO row sum is zeroed, a NEGATIVE row sum's NaN propagates (an
    isfinite guard silently zeroed such rows where the XLA path loudly
    NaNs)."""
    from fcsr_tpu.core.normalize import normalize_adj
    from fcsr_tpu.core.pallas_kernels import normalize_adj_pallas

    a = np.zeros((1, 8, 8), np.float32)
    a[0, 0, 1] = a[0, 1, 0] = -1.0   # negative row sums for rows 0/1
    a[0, 2, 3] = a[0, 3, 2] = 0.5    # normal rows
    # rows 4..7 are all-zero -> zero degree
    want = np.asarray(normalize_adj(a[0]))
    got = np.asarray(normalize_adj_pallas(a, interpret=True))[0]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    mask = ~np.isnan(want)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6)
