"""Tests for differentiable metrics (ref: utils/metrics.py), COO graph
conversion (ref: utils/data.py:15-54), and topological node features
(ref: dataset.py:34-99)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.core.graph import (
    create_graph,
    to_dense_adj,
    topological_node_features,
)
from fcsr_tpu.evalx.differentiable import (
    betweenness_approx,
    eigenvector_power,
    evaluate_model_mae,
    gsr_loss,
    pagerank_diff,
)
from tests.conftest import random_symmetric


def test_coo_roundtrip(rng):
    a = random_symmetric(rng, 12, density=0.4)
    g = create_graph(a)
    assert g.num_nodes == 12
    assert g.x.shape == (12, 1)
    assert g.edge_index.shape[0] == 2
    np.testing.assert_allclose(to_dense_adj(g), a, atol=1e-7)


def test_differentiable_metrics_match_naive(rng):
    a = random_symmetric(rng, 10).astype(np.float32)

    # betweenness approx: rowsums of (A+I)^10 / total
    d = np.linalg.matrix_power(a + np.eye(10, dtype=np.float32), 10)
    want_bc = d.sum(1) / d.sum()
    np.testing.assert_allclose(np.asarray(betweenness_approx(a)), want_bc,
                               rtol=1e-4)

    # eigenvector power iteration converges to dominant eigvec of (A+I)
    ec = np.asarray(eigenvector_power(a))
    evals, evecs = np.linalg.eigh(a + np.eye(10))
    lead = np.abs(evecs[:, -1])
    np.testing.assert_allclose(np.abs(ec) / np.linalg.norm(ec), lead,
                               atol=1e-4)

    # pagerank sums to ~1
    pr = np.asarray(pagerank_diff(a))
    np.testing.assert_allclose(pr.sum(), 1.0, atol=1e-3)


@pytest.mark.slow
def test_gsr_loss_zero_for_identical(rng):
    a = jnp.asarray(np.stack([random_symmetric(rng, 8) for _ in range(2)]))
    assert float(gsr_loss(a, a)) == 0.0
    b = a * 0.5
    assert float(gsr_loss(a, b)) > 0.0
    # differentiable: gradient flows
    g = jax.grad(lambda x: gsr_loss(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_evaluate_model_mae(rng):
    a = np.stack([random_symmetric(rng, 6) for _ in range(3)])
    assert evaluate_model_mae(a, a) == 0.0
    assert evaluate_model_mae(a, a * 0.0) > 0


def test_topological_features_match_reference_formulas(rng):
    """Numpy mirror of the reference's exact formulas
    (dataset.py:14-102): weighted 'degree', weighted triangle clustering
    without the 1/2 factor, resolvent closeness, power-iteration EC,
    zero betweenness stub."""
    n = 15
    # scale down so the resolvent (I - W)^-1 is well-conditioned
    w = (random_symmetric(rng, n, density=0.4) * (0.9 / n)).astype(
        np.float32)
    feats = topological_node_features(w)

    degree = w.sum(1)
    np.testing.assert_allclose(np.asarray(feats["degree"]), degree,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feats["strength"]), degree,
                               rtol=1e-5)

    tri = np.diagonal(w @ w @ w)
    poss = degree * (degree - 1)
    want_c = np.where(poss > 0, tri / np.where(poss > 0, poss, 1), 0.0)
    np.testing.assert_allclose(np.asarray(feats["clustering"]), want_c,
                               rtol=1e-4)

    cnt = (w > 0).sum(1)
    want_and = np.where(cnt > 0, (w @ degree) / np.where(cnt > 0, cnt, 1),
                        0.0)
    np.testing.assert_allclose(np.asarray(feats["avg_neighbor_degree"]),
                               want_and, rtol=1e-4)

    np.testing.assert_allclose(np.asarray(feats["degree_centrality"]),
                               degree / (n - 1), rtol=1e-5)

    want_close = np.linalg.inv(np.eye(n) - w).sum(1) / (n - 1)
    np.testing.assert_allclose(np.asarray(feats["closeness"]), want_close,
                               rtol=1e-3)

    assert np.all(np.asarray(feats["betweenness"]) == 0)  # faithful stub

    ec = np.asarray(feats["eigenvector"])
    evals, evecs = np.linalg.eigh(w.astype(np.float64))
    lead = np.abs(evecs[:, -1])
    np.testing.assert_allclose(np.abs(ec) / np.linalg.norm(ec), lead,
                               atol=1e-3)

    assert feats["stacked"].shape == (n, 8)

    # batched matches per-sample
    batch = np.stack([w, w * 0.5])
    fb = topological_node_features(batch)
    np.testing.assert_allclose(np.asarray(fb["degree"][0]),
                               np.asarray(feats["degree"]), rtol=1e-5)
    assert fb["stacked"].shape == (2, n, 8)


def test_glorot_helpers():
    from fcsr_tpu.utils.initializations import (glorot_init,
                                                glorot_uniform_square)
    w = glorot_uniform_square(16, seed=0)
    lim = np.sqrt(6.0 / 32)
    assert w.shape == (16, 16)
    assert np.all(np.abs(w) <= lim)
    w2 = np.asarray(glorot_init(jax.random.PRNGKey(0), (8, 24)))
    assert np.all(np.abs(w2) <= np.sqrt(6.0 / 32))
