"""GSR-Net tests: output invariants, static pooling sizes, exactness of the
eigh hoisting, and a full-forward parity check against an independent numpy
mirror of the reference semantics (ref: models/gsr_model.py, models/ops.py,
models/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcsr_tpu.models import GSRNet, pool_sizes
from fcsr_tpu.train import (
    GSRTrainConfig,
    evaluate_gsr,
    init_gsr,
    precompute_spectral,
    train_gsr_fold,
)
from tests.conftest import random_symmetric


SMALL = GSRTrainConfig(lr_dim=20, hr_dim=32, hidden_dim=32,
                       ks=(0.9, 0.7), epochs=2)


def test_pool_sizes_reference_config():
    # banker's rounding at 30.5 -> 30, per Python round() semantics used by
    # the reference (models/ops.py:42)
    assert pool_sizes(160, (0.9, 0.7, 0.6, 0.5)) == (144, 101, 61, 30)
    assert pool_sizes(20, (0.9, 0.7)) == (18, 13)


@pytest.fixture(scope="module")
def small_model():
    model, params, tx, opt = init_gsr(SMALL, jax.random.PRNGKey(1))
    return model, params


def test_forward_invariants(rng, small_model):
    model, params = small_model
    lr = random_symmetric(rng, SMALL.lr_dim)
    pred, net_outs, start_outs, layer_outs = model.apply(params, lr)
    pred = np.asarray(pred)
    assert pred.shape == (SMALL.hr_dim, SMALL.hr_dim)
    np.testing.assert_allclose(pred, pred.T, atol=1e-5)
    np.testing.assert_allclose(np.diag(pred), 1.0, atol=1e-6)
    assert (pred >= 0).all()
    assert net_outs.shape == (SMALL.lr_dim, SMALL.hr_dim)
    assert start_outs.shape == (SMALL.lr_dim, SMALL.hr_dim)
    assert layer_outs.shape == (SMALL.hr_dim, SMALL.hr_dim)


def test_precomputed_eigh_is_exact(rng, small_model):
    """Passing precomputed u_lr must give bit-identical outputs to the
    in-forward eigh — the hoisting is exact, not approximate."""
    model, params = small_model
    lr = random_symmetric(rng, SMALL.lr_dim)
    from fcsr_tpu.core.normalize import normalize_adj
    _, u_lr = jnp.linalg.eigh(normalize_adj(lr))
    out_a = model.apply(params, lr)
    out_b = model.apply(params, lr, u_lr=u_lr)
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _numpy_gsrnet_forward(params, lr, ks, lr_dim, hr_dim, u_lr):
    """Independent numpy re-derivation of the full forward pass from the
    documented reference semantics."""
    p = jax.tree_util.tree_map(lambda a: np.asarray(a, dtype=np.float64),
                               params)["params"]
    lr = np.asarray(lr, dtype=np.float64)

    def normalize(mx):
        rowsum = mx.sum(1)
        with np.errstate(divide="ignore"):
            r = rowsum ** -0.5
        r[np.isinf(r)] = 0.0
        return ((mx @ np.diag(r)).T) @ np.diag(r)

    def gcn(name, x):
        w = np.asarray(p["net"][name]["proj"]["kernel"])
        b = np.asarray(p["net"][name]["proj"]["bias"])
        return x @ w + b

    adj = normalize(lr)
    x = np.eye(lr_dim, dtype=np.float64)

    # Graph U-Net
    x = gcn("start_gcn", x)
    start_outs = x
    org_x = x
    adj_ms, idx_list, down_outs = [], [], []
    a = adj
    sizes = []
    n = lr_dim
    for k in ks:
        n = max(1, int(round(k * n)))
        sizes.append(n)
    for i, k in enumerate(ks):
        x = gcn(f"down_gcns_{i}", x)
        adj_ms.append(a)
        down_outs.append(x)
        w = np.asarray(p["net"][f"pools_{i}"]["proj"]["kernel"])
        b = np.asarray(p["net"][f"pools_{i}"]["proj"]["bias"])
        scores = 1 / (1 + np.exp(-(x @ w + b).squeeze(-1) / 100))
        idx = np.argsort(-scores, kind="stable")[: sizes[i]]
        x = x[idx] * scores[idx][:, None]
        a = a[idx][:, idx]
        idx_list.append(idx)
    x = gcn("bottom_gcn", x)
    for i in range(len(ks)):
        up = len(ks) - i - 1
        a, idx = adj_ms[up], idx_list[up]
        nx_ = np.zeros((a.shape[0], x.shape[1]), dtype=x.dtype)
        nx_[idx] = x
        x = gcn(f"up_gcns_{i}", nx_)
        x = x + down_outs[up]
    x = np.concatenate([x, org_x], axis=1)
    net_outs = gcn("end_gcn", x)

    # GSR layer
    w_gsr = np.asarray(p["layer"]["weights"])
    eye = np.eye(lr_dim, dtype=np.float64)
    s_d = np.concatenate([eye, eye[: hr_dim - lr_dim]], axis=0)
    a_m = w_gsr @ s_d.T
    pad = hr_dim - lr_dim
    u_pad = np.pad(np.asarray(u_lr, dtype=np.float64), ((0, pad), (0, pad)))
    b_m = a_m @ u_pad.T
    f_pad = np.pad(net_outs, ((0, hr_dim - net_outs.shape[0]), (0, 0)))
    f_d = np.abs(b_m @ f_pad)
    np.fill_diagonal(f_d, 1.0)
    layer_adj = normalize(f_d)
    z = layer_adj @ layer_adj.T
    z = (z + z.T) / 2
    np.fill_diagonal(z, 1.0)
    z = np.abs(z)

    # decoder
    g1 = np.asarray(p["gc1"]["weight"])
    g2 = np.asarray(p["gc2"]["weight"])
    h1 = layer_adj @ (z @ g1)
    h2 = layer_adj @ (h1 @ g2)
    out = (h2 + h2.T) / 2
    np.fill_diagonal(out, 1.0)
    return np.abs(out), net_outs, start_outs, layer_adj


def test_forward_matches_numpy_mirror(rng, small_model):
    model, params = small_model
    lr = random_symmetric(rng, SMALL.lr_dim)
    from fcsr_tpu.core.normalize import normalize_adj
    _, u_lr = jnp.linalg.eigh(normalize_adj(lr))
    got = model.apply(params, lr, u_lr=u_lr)
    want = _numpy_gsrnet_forward(params, lr, SMALL.ks, SMALL.lr_dim,
                                 SMALL.hr_dim, np.asarray(u_lr))
    # The mirror runs in float64; both it and the f32 model approximate the
    # exact result to within f32 accumulation error over ~10 chained matmuls.
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=3e-3)


def test_vmap_forward(rng, small_model):
    model, params = small_model
    batch = np.stack([random_symmetric(rng, SMALL.lr_dim) for _ in range(3)])
    preds = jax.vmap(lambda m: model.apply(params, m)[0])(jnp.asarray(batch))
    singles = [np.asarray(model.apply(params, b)[0]) for b in batch]
    for i in range(3):
        np.testing.assert_allclose(np.asarray(preds[i]), singles[i],
                                   atol=1e-5)


def _tiny_data(rng, n=6):
    lr = np.stack([random_symmetric(rng, SMALL.lr_dim) for _ in range(n)])
    hr = np.stack([random_symmetric(rng, SMALL.hr_dim) for _ in range(n)])
    return lr, hr


def test_training_decreases_loss(rng):
    cfg = GSRTrainConfig(lr_dim=SMALL.lr_dim, hr_dim=SMALL.hr_dim,
                         hidden_dim=SMALL.hidden_dim, ks=SMALL.ks,
                         epochs=15, lr=1e-3)
    model, params, tx, opt = init_gsr(cfg, jax.random.PRNGKey(0))
    lr_stack, hr_stack = _tiny_data(rng)
    params, opt, hist = train_gsr_fold(params, opt, model, tx, cfg,
                                       lr_stack, hr_stack)
    assert hist["loss"][-1] < hist["loss"][0]
    assert np.isfinite(hist["loss"]).all()


def test_training_deterministic(rng):
    cfg = GSRTrainConfig(lr_dim=SMALL.lr_dim, hr_dim=SMALL.hr_dim,
                         hidden_dim=SMALL.hidden_dim, ks=SMALL.ks, epochs=3)
    lr_stack, hr_stack = _tiny_data(rng, n=4)
    hists = []
    for _ in range(2):
        model, params, tx, opt = init_gsr(cfg, jax.random.PRNGKey(7))
        _, _, hist = train_gsr_fold(params, opt, model, tx, cfg,
                                    lr_stack, hr_stack)
        hists.append(hist["loss"])
    np.testing.assert_array_equal(hists[0], hists[1])


def test_evaluate_skips_all_zero_and_fills_diag(rng):
    cfg = SMALL
    model, params, tx, opt = init_gsr(cfg, jax.random.PRNGKey(2))
    lr_stack, hr_stack = _tiny_data(rng, n=4)
    lr_stack[2] = 0.0  # all-zero subject must be skipped (gsr_train.py:65-68)
    mae, preds, gts = evaluate_gsr(params, model, cfg, lr_stack, hr_stack)
    assert preds.shape[0] == 3
    assert np.all(np.diagonal(gts, axis1=1, axis2=2) == 1.0)
    assert np.isfinite(mae)


def test_gsr_layer_standalone_batched(rng):
    """BASELINE config #2: the spectral upsampling layer alone — batched
    eigh + learnable-W propagation, vmapped, with gradients."""
    import jax.numpy as jnp
    from fcsr_tpu.core.normalize import normalize_adj
    from fcsr_tpu.models.gsr import GSRLayer

    lr_dim, hr_dim, b = 20, 32, 4
    layer = GSRLayer(hr_dim=hr_dim, lr_dim=lr_dim)
    adjs = jnp.asarray(np.stack([
        normalize_adj(random_symmetric(rng, lr_dim)) for _ in range(b)]))
    feats = jnp.asarray(rng.random((b, lr_dim, hr_dim)).astype(np.float32))
    _, u = jnp.linalg.eigh(adjs)
    variables = layer.init(jax.random.PRNGKey(0), adjs[0], feats[0])

    def batched(variables, adjs, feats, u):
        return jax.vmap(lambda a, f, uu: layer.apply(variables, a, f,
                                                     u_lr=uu))(adjs, feats, u)

    adj_out, x_out = batched(variables, adjs, feats, u)
    assert adj_out.shape == (b, hr_dim, hr_dim)
    assert x_out.shape == (b, hr_dim, hr_dim)
    assert np.isfinite(np.asarray(adj_out)).all()

    # gradient flows into the learnable weights
    g = jax.grad(lambda v: jnp.sum(batched(v, adjs, feats, u)[1]))(variables)
    gw = np.asarray(g["params"]["weights"])
    assert gw.shape == (hr_dim, lr_dim)
    assert np.abs(gw).sum() > 0


def test_precompute_spectral_disk_cache(tmp_path, monkeypatch, rng):
    """The spectral precompute's disk cache must actually round-trip:
    a second call (fresh cache-key computation) returns bit-identical
    arrays from the file np.savez REALLY wrote (regression: np.savez
    appends .npz to suffix-less tmp names, which silently broke the
    os.replace and left the cache permanently cold), and different
    data/config miss."""
    import os

    from fcsr_tpu.train.gsr_loop import (_spectral_cache_path,
                                         precompute_spectral)
    from tests.conftest import random_symmetric

    monkeypatch.setenv("FCSR_SPECTRAL_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("FCSR_NO_SPECTRAL_CACHE", raising=False)
    lr = np.stack([random_symmetric(rng, 12) for _ in range(4)])
    hr = np.stack([random_symmetric(rng, 20) for _ in range(4)])

    u1, v1 = precompute_spectral(lr, hr, lr_dim=12)
    path = _spectral_cache_path(np.asarray(lr, np.float32),
                                np.asarray(hr, np.float32), 12, 0)
    assert os.path.exists(path), "cache file missing after compute"
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]

    u2, v2 = precompute_spectral(lr, hr, lr_dim=12)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(v1, v2)

    # different content or config -> different key (no false hits)
    p_other = _spectral_cache_path(np.asarray(lr + 1e-3, np.float32),
                                   np.asarray(hr, np.float32), 12, 0)
    assert p_other != path
    assert _spectral_cache_path(np.asarray(lr, np.float32),
                                np.asarray(hr, np.float32), 12, 2) != path

    # the kill switch bypasses the cache but returns the same values
    monkeypatch.setenv("FCSR_NO_SPECTRAL_CACHE", "1")
    u3, v3 = precompute_spectral(lr, hr, lr_dim=12)
    np.testing.assert_allclose(u1, u3, atol=0)
