"""Fused GAT training-step kernel (models/fused_gat.py): the pure
gather-free formulation matches the flax model exactly, the kernel's
in-kernel AD + AdamW matches the XLA reference, and the fold-parallel
trainer with cfg.fused_step tracks the op-graph path."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.core.normalize import symmetric_normalize
from fcsr_tpu.models.fused_gat import (
    gat_leaves_from_tree,
    gat_step_loss,
    gat_train_step_fused,
    gat_tree_from_leaves,
)
from fcsr_tpu.train.gat_loop import (
    GATTrainConfig,
    precompute_gat_features,
    unet_loss,
)

CFG = GATTrainConfig(n_nodes=20, m_nodes=32, dim=4, ks=(0.5, 0.5),
                     heads=2, drop_p=0.0)
KW = dict(dim=4, ks=(0.5, 0.5), n_nodes=20, m_nodes=32, heads=2)


def _setup(rng):
    model = CFG.model()
    a_raw = rng.random((20, 20)).astype(np.float32)
    a_raw = (a_raw + a_raw.T) / 2
    a_raw = np.where(a_raw > 0.3, a_raw, 0.0).astype(np.float32)
    hr = rng.random((32, 32)).astype(np.float32)
    hr = jnp.asarray((hr + hr.T) / 2)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, jnp.asarray(a_raw))
    x_feat = precompute_gat_features(a_raw[None], dim=4)[0]
    a0 = symmetric_normalize(jnp.asarray(a_raw) + jnp.eye(20))
    leaves = gat_leaves_from_tree(v["params"], 4, (0.5, 0.5), 2)
    return model, v, a_raw, hr, x_feat, a0, leaves


def test_leaf_tree_roundtrip(rng):
    _, v, *_ , leaves = _setup(rng)
    tree2 = gat_tree_from_leaves(leaves, 4, (0.5, 0.5), 2)
    flat1 = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    flat2 = jax.tree_util.tree_flatten_with_path(tree2)[0]
    assert len(flat1) == len(flat2)
    for (p1, l1), (p2, l2) in zip(flat1, flat2):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.slow
def test_gat_step_loss_matches_model(rng):
    """Pure gather-free step loss == model.apply + unet_loss (drop_p=0;
    exact on CPU where the compensated matmul evaluates in f32)."""
    model, v, a_raw, hr, x_feat, a0, leaves = _setup(rng)
    pred, a_hist, a_recon = model.apply(v, jnp.asarray(a_raw), x=x_feat,
                                        train=False)
    want = float(unet_loss(pred, hr, a_hist, a_recon, True))
    got = float(gat_step_loss(leaves, a0, x_feat, hr, **KW))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_val_kernel_matches_model(rng):
    """gat_val_fused (interpret) == unfused flax val: identical loss
    (training objective at train=False) and off-diagonal MAE."""
    from fcsr_tpu.models.fused_gat import gat_val_fused

    model, v, a_raw, hr, x_feat, a0, leaves = _setup(rng)
    pred, a_hist, a_recon = model.apply(v, jnp.asarray(a_raw), x=x_feat,
                                        train=False)
    want_loss = float(unet_loss(pred, hr, a_hist, a_recon, True))
    off = 1.0 - jnp.eye(32)
    want_mae = float(jnp.mean(jnp.abs(pred * off - hr * off)))
    loss, mae = gat_val_fused(leaves, a0, x_feat, hr, interpret=True,
                              **KW)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-6)
    np.testing.assert_allclose(float(mae), want_mae, rtol=1e-6)


def test_batched_chain_matches_perhead(rng):
    """The (n, heads*n) batched softmax chain (_gat_layer_batched) ==
    the per-head chain: loss identical (row-global softmax shift
    cancels per block), grads to FP-reassociation level."""
    _, _, _, hr, x_feat, a0, leaves = _setup(rng)
    f0 = lambda l: gat_step_loss(l, a0, x_feat, hr, **KW)
    f1 = lambda l: gat_step_loss(l, a0, x_feat, hr, batched_chain=True,
                                 **KW)
    l0, g0 = jax.value_and_grad(f0)(leaves)
    l1, g1 = jax.value_and_grad(f1)(leaves)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(g0, g1):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=5e-5)


@pytest.mark.slow
def test_gat_kernel_interpret_matches_pure(rng):
    """Kernel (interpret): loss and implied grads (via the Adam moment
    update m' = 0.1 g at t=1) match jax.value_and_grad of the pure
    formulation."""
    _, _, _, hr, x_feat, a0, leaves = _setup(rng)
    lv, grads = jax.value_and_grad(
        lambda l: gat_step_loss(l, a0, x_feat, hr, **KW))(leaves)
    m0 = [jnp.zeros_like(l) for l in leaves]
    v0 = [jnp.zeros_like(l) for l in leaves]
    scal = jnp.asarray([[1.0, 1e-3, 0.1, 0.001]], jnp.float32)
    seeds = jnp.zeros((1, 2), jnp.int32)
    loss_k, p2, m2, v2 = gat_train_step_fused(
        leaves, m0, v0, a0, x_feat, hr, scal, seeds, interpret=True, **KW)
    np.testing.assert_allclose(float(loss_k), float(lv), atol=1e-6)
    for g_ref, m_new in zip(grads, m2):
        g_k = np.asarray(m_new) / 0.1
        np.testing.assert_allclose(g_k, np.asarray(g_ref), atol=1e-6)


@pytest.mark.slow
def test_fused_gat_trainer_matches_unfused(rng):
    """Fold-parallel GAT trainer with cfg.fused_step tracks the op-graph
    path (drop_p=0; interpret kernels on CPU)."""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.gat_loop import train_gat_folds_parallel

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    hists = []
    for fused in (False, True):
        cfg = GATTrainConfig(n_nodes=20, m_nodes=32, dim=4, ks=(0.5, 0.5),
                             heads=2, drop_p=0.0, epochs=2,
                             fused_step=fused, scan_unroll=1)
        _, _, h = train_gat_folds_parallel(cfg, lr, hr, folds, seed=42)
        hists.append(h)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(hists[0][j]["val"]),
                                   np.asarray(hists[1][j]["val"]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(hists[0][j]["train"]),
                                   np.asarray(hists[1][j]["train"]),
                                   atol=1e-6)


def test_heads1_dropout_masks_are_per_head_lists(rng):
    """heads==1 dropout regression: every mask entry is a per-head LIST
    so ``drop_mask[j]`` selects head j's (n, n) mask — a bare array
    would broadcast ROW 0 over alpha (whole columns dropped together).
    Checked structurally against _mask_shapes and behaviorally: the
    per-head and batched chains agree under explicit heads==1 masks,
    and differ from the no-dropout loss (masks are live)."""
    from fcsr_tpu.models.fused_gat import _mask_shapes, gat_leaves_from_tree
    from fcsr_tpu.models.gat_unet import symmetric_normalize

    kw = dict(dim=4, ks=(0.5, 0.5), n_nodes=20, m_nodes=32, heads=1)
    cfg1 = GATTrainConfig(n_nodes=20, m_nodes=32, dim=4, ks=(0.5, 0.5),
                          heads=1, drop_p=0.5)
    model = cfg1.model()
    a_raw = rng.random((20, 20)).astype(np.float32)
    a_raw = np.where(a_raw > 0.3, (a_raw + a_raw.T) / 2, 0.0)
    a_raw = a_raw.astype(np.float32)
    hr = rng.random((32, 32)).astype(np.float32)
    hr = jnp.asarray((hr + hr.T) / 2)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, jnp.asarray(a_raw))
    x_feat = precompute_gat_features(a_raw[None], dim=4)[0]
    a0 = symmetric_normalize(jnp.asarray(a_raw) + jnp.eye(20))
    leaves = gat_leaves_from_tree(v["params"], 4, (0.5, 0.5), 1)

    masks = {}
    for name, count, shape in _mask_shapes(4, (0.5, 0.5), 20, 1):
        masks[name] = [
            jnp.asarray((rng.random(shape) >= 0.5).astype(np.float32))
            for _ in range(count)]
        assert isinstance(masks[name], list)

    l_plain = float(gat_step_loss(leaves, a0, x_feat, hr, **kw))
    l_ph = float(gat_step_loss(leaves, a0, x_feat, hr, drop_p=0.5,
                               drop_masks=masks, **kw))
    l_bc = float(gat_step_loss(leaves, a0, x_feat, hr, drop_p=0.5,
                               drop_masks=masks, batched_chain=True,
                               **kw))
    assert l_ph != l_plain  # masks actually applied
    np.testing.assert_allclose(l_bc, l_ph, rtol=1e-6)


def test_dropout_bit_transform_binomial_bounds(rng):
    """The PRODUCTION bits->keep transform (fused_gat._bits_to_keep_mask
    — the function the kernel itself calls, not a re-typed copy) must
    map SIGNED int32 PRNG words to keep ~ Bernoulli(1 - p): empirical
    keep rates inside 4-sigma binomial bounds at every tested p. The
    old `bits >> 8` arithmetic shift kept ~49% at any small drop_p —
    the class of bug that shipped for most of round 3 must not be able
    to ship silently again (VERDICT r3 item 3b)."""
    from fcsr_tpu.models.fused_gat import _bits_to_keep_mask

    n = 512 * 512
    bits = jnp.asarray(rng.integers(-2**31, 2**31, size=(512, 512),
                                    dtype=np.int64).astype(np.int32))
    for p in (0.01, 0.1, 0.5, 0.9):
        keep = float(np.asarray(_bits_to_keep_mask(bits, p)).mean())
        sigma = np.sqrt(p * (1 - p) / n)
        assert abs(keep - (1.0 - p)) < 4 * sigma + 1e-6, (p, keep)
    # masks are exactly {0, 1}
    m = np.asarray(_bits_to_keep_mask(bits, 0.3))
    assert set(np.unique(m)) <= {0.0, 1.0}


@pytest.mark.slow
def test_fused_dropout_trained_mae_band(rng):
    """Fused-vs-flax dropout TRAINED-MAE band (VERDICT r3 item 3b): at
    a prominent drop_p the fused trainer (in-kernel masks, interpret
    path on CPU — full dropout placement + 1/(1-p) scaling) and the
    op-graph flax-dropout trainer are different PRNG streams of the
    same stochastic process, so their trained val MAEs must agree to a
    band far tighter than the keep-49%-instead-of-70% failure mode
    would produce."""
    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.gat_loop import train_gat_folds_parallel

    d = load_or_synthesize(None, n_train=6, n_test=1, seed=3)
    lr = d["lr_train"][:, :20, :20].copy()
    hr = d["hr_train"][:, :32, :32].copy()
    folds = kfold_indices(6, 2, seed=42)
    maes = {}
    for fused in (False, True):
        cfg = GATTrainConfig(n_nodes=20, m_nodes=32, dim=4,
                             ks=(0.5, 0.5), heads=2, drop_p=0.3,
                             epochs=3, fused_step=fused, scan_unroll=1)
        _, _, h = train_gat_folds_parallel(cfg, lr, hr, folds, seed=42)
        maes[fused] = np.asarray([hj["val"][-1] for hj in h],
                                 dtype=np.float64)
    # stochastic equivalence, not bitwise: generous band that still
    # catches a systematically wrong keep rate (which shifts val MAE
    # far outside it at drop_p=0.3)
    rel = np.abs(maes[True] - maes[False]) / np.abs(maes[False])
    assert np.all(rel < 0.25), (maes, rel)
