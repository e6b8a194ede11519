"""Tests for the GAT Graph-U-Net family
(ref: unet-transformer.py) and its training loop."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.models.gat_unet import (
    DenseGAT,
    GATGraphUnet,
    gat_pool_sizes,
    reconstruct_adjacency,
    svd_node_features,
)
from fcsr_tpu.train.gat_loop import (
    GATTrainConfig,
    init_gat,
    precompute_gat_features,
    predict_gat,
    train_gat,
    unet_loss,
)
from tests.conftest import random_symmetric

SMALL = GATTrainConfig(ks=(0.5, 0.5), n_nodes=24, m_nodes=32, dim=8,
                       heads=2, epochs=3)


def test_gat_pool_sizes():
    # truncation with floor of 2, NOT banker's rounding
    # (ref: unet-transformer.py:413)
    assert gat_pool_sizes(160, (0.5, 0.5, 0.5)) == (80, 40, 20)
    assert gat_pool_sizes(5, (0.5, 0.5, 0.5)) == (2, 2, 2)


def test_dense_gat_matches_manual_attention(rng):
    """DenseGAT equals a hand-rolled masked-softmax attention computation."""
    n, in_dim, out_dim, heads = 10, 6, 8, 2
    adj = random_symmetric(rng, n, density=0.5)
    x = rng.random((n, in_dim)).astype(np.float32)
    layer = DenseGAT(in_dim, out_dim, heads=heads, dropout=0.0)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(adj),
                           jnp.asarray(x))
    got = np.asarray(layer.apply(variables, jnp.asarray(adj),
                                 jnp.asarray(x)))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    d = out_dim // heads
    h = (x @ p["w"]).reshape(n, heads, d)
    a_src = np.einsum("nhd,hd->nh", h, p["att_src"])
    a_dst = np.einsum("nhd,hd->nh", h, p["att_dst"])
    logits = a_src[None, :, :] + a_dst[:, None, :]
    logits = np.where(logits >= 0, logits, 0.2 * logits)  # leaky relu
    mask = (adj != 0) | np.eye(n, dtype=bool)
    logits = np.where(mask[:, :, None], logits, -np.inf)
    e = np.exp(logits - np.nanmax(np.where(np.isfinite(logits), logits,
                                           np.nan), axis=1, keepdims=True))
    e = np.where(mask[:, :, None], e, 0.0)
    alpha = e / e.sum(axis=1, keepdims=True)
    want = np.einsum("ijh,jhd->ihd", alpha, h).reshape(n, -1) + p["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_svd_features_shape_and_orthonormal(rng):
    a = random_symmetric(rng, 20)
    u = np.asarray(svd_node_features(jnp.asarray(a), 5))
    assert u.shape == (20, 5)
    np.testing.assert_allclose(u.T @ u, np.eye(5), atol=1e-4)


def test_gat_unet_forward_shapes(rng):
    model, variables, tx, opt = init_gat(SMALL, jax.random.PRNGKey(0))
    a = jnp.asarray(random_symmetric(rng, SMALL.n_nodes))
    pred, a_hist, a_recon = model.apply(variables, a, train=False)
    assert pred.shape == (SMALL.m_nodes, SMALL.m_nodes)
    assert np.all(np.asarray(pred) >= 0)  # relu decode
    sizes = (SMALL.n_nodes,) + gat_pool_sizes(SMALL.n_nodes, SMALL.ks)[:-1]
    assert tuple(m.shape[0] for m in a_hist) == sizes
    # recon history comes back in up-path (reverse) order
    assert tuple(m.shape[0] for m in a_recon) == sizes[::-1]
    # pred symmetric (softmax'd inner product)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred).T,
                               atol=1e-5)


def test_unet_loss_pairing(rng):
    """Intermediate losses pair A_hist with reversed A_recon_hist
    (matching node counts at every level, ref: unet-transformer.py:470)."""
    model, variables, tx, opt = init_gat(SMALL, jax.random.PRNGKey(0))
    a = jnp.asarray(random_symmetric(rng, SMALL.n_nodes))
    pred, a_hist, a_recon = model.apply(variables, a, train=False)
    target = jnp.asarray(random_symmetric(rng, SMALL.m_nodes))
    loss = unet_loss(pred, target, a_hist, a_recon, True)
    assert np.isfinite(float(loss))
    loss_no_int = unet_loss(pred, target, a_hist, a_recon, False)
    assert float(loss) >= float(loss_no_int)


@pytest.mark.slow
def test_gat_training_runs_and_improves(rng):
    cfg = SMALL
    model, variables, tx, opt = init_gat(cfg, jax.random.PRNGKey(1))
    lr_tr = np.stack([random_symmetric(rng, cfg.n_nodes) for _ in range(6)])
    hr_tr = np.stack([random_symmetric(rng, cfg.m_nodes) for _ in range(6)])
    variables, opt, hist = train_gat(variables, opt, model, tx, cfg,
                                     lr_tr, hr_tr, lr_tr[:2], hr_tr[:2])
    assert len(hist["train"]) == cfg.epochs
    assert np.isfinite(hist["train"]).all()
    preds = np.asarray(predict_gat(variables, model, cfg, lr_tr[:3]))
    assert preds.shape == (3, cfg.m_nodes, cfg.m_nodes)


def test_precompute_features_match_in_forward(rng):
    """Precomputed SVD features give the same forward as in-call SVD."""
    model, variables, tx, opt = init_gat(SMALL, jax.random.PRNGKey(0))
    a = random_symmetric(rng, SMALL.n_nodes)
    x = precompute_gat_features(jnp.asarray(a[None]), dim=SMALL.dim)[0]
    out_a = model.apply(variables, jnp.asarray(a), train=False)
    out_b = model.apply(variables, jnp.asarray(a), x=x, train=False)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-6)


@pytest.mark.slow
def test_gat_unet_skip_connections(rng):
    """skip=True adds down-path and input skips
    (ref: unet-transformer.py:336-359); outputs must differ from the
    skip-free model under identical params."""
    # skip is only shape-consistent when feature dims stay uniform
    # (all ks == 1), a latent constraint inherited from the reference
    # (unet-transformer.py:354-359; its shipped run uses skip=False)
    cfg_skip = GATTrainConfig(ks=(1.0, 1.0), n_nodes=24, m_nodes=32,
                              dim=8, heads=2, epochs=1, skip=True)
    model_s, variables, tx, opt = init_gat(cfg_skip, jax.random.PRNGKey(0))
    a = jnp.asarray(random_symmetric(rng, 24))
    pred_s, _, _ = model_s.apply(variables, a, train=False)
    cfg_noskip = GATTrainConfig(ks=(1.0, 1.0), n_nodes=24, m_nodes=32,
                                dim=8, heads=2, epochs=1, skip=False)
    model_n = cfg_noskip.model()
    pred_n, _, _ = model_n.apply(variables, a, train=False)
    assert pred_s.shape == (32, 32)
    assert not np.allclose(np.asarray(pred_s), np.asarray(pred_n))
    # skip model still trains
    lr_tr = np.stack([random_symmetric(rng, 24) for _ in range(4)])
    hr_tr = np.stack([random_symmetric(rng, 32) for _ in range(4)])
    variables, opt, hist = train_gat(variables, opt, model_s, tx, cfg_skip,
                                     lr_tr, hr_tr, lr_tr[:2], hr_tr[:2])
    assert np.isfinite(hist["train"]).all()
