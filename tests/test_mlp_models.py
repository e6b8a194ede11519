"""Tests for the MLP model family and the generic training loop
(ref: models/mlp.py, training_template.ipynb cell-5, utils/training.py)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.models.mlp import SpectralResMLP, SuperResMLP
from fcsr_tpu.train.generic_loop import (
    PlateauScheduler,
    mse_criterion,
    train_model,
)
from tests.conftest import random_symmetric


def _batch(rng, b, n):
    return np.stack([random_symmetric(rng, n) for _ in range(b)])


def test_superres_mlp_shapes(rng):
    model = SuperResMLP(input_size=12 * 12, output_size=16 * 16,
                        hidden_dim=32, n_layers=2)
    x = jnp.asarray(_batch(rng, 4, 12))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (4, 16, 16)
    # train mode mutates batch stats and uses dropout rng
    out2, updates = model.apply(variables, x, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(2)})
    assert out2.shape == (4, 16, 16)
    assert "batch_stats" in updates


@pytest.mark.slow
def test_spectral_mlp_output_properties(rng):
    model = SpectralResMLP(num_nodes_input=10, num_nodes_output=14,
                           num_hidden=24, n_layers=1)
    x = jnp.asarray(_batch(rng, 3, 10))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    out = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == (3, 14, 14)
    # symmetric, zero diagonal, values in (0, 1) off-diagonal (sigmoid)
    np.testing.assert_allclose(out, np.swapaxes(out, 1, 2), atol=1e-6)
    assert np.all(np.diagonal(out, axis1=1, axis2=2) == 0)
    off = out[:, ~np.eye(14, dtype=bool)]
    # sigmoid range; endpoints reachable in f32 — torch's legacy
    # spectral_norm uses the random stored (u, v) for eval-mode sigma
    # before any training step, so an untrained eval forward may
    # saturate (SNDense reproduces exactly that)
    assert np.all(off >= 0) and np.all(off <= 1)
    # after ONE training step the power iteration estimates a real
    # sigma and the outputs leave the saturated endpoints
    out_t, upd = model.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    variables = {**variables, "batch_stats": upd["batch_stats"]}
    out2 = np.asarray(model.apply(variables, x, train=False))
    off2 = out2[:, ~np.eye(14, dtype=bool)]
    assert np.all(off2 > 0) and np.all(off2 < 1)


def test_spectral_norm_constrains_weights(rng):
    """After update steps the spectral_norm collection tracks u/v vectors."""
    model = SpectralResMLP(num_nodes_input=8, num_nodes_output=10,
                           num_hidden=16, n_layers=0)
    x = jnp.asarray(_batch(rng, 2, 8))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    assert "batch_stats" in variables
    # SNDense stores torch-layout u/v power-iteration vectors under each
    # spectral-norm'd dense's own scope (models/mlp.py::SNDense)
    bs = variables["batch_stats"]
    for name, out_f, in_f in [("input_dense", 16, 28),
                              ("output_dense", 45, 16)]:
        assert set(bs[name]) == {"u", "v"}, (name, bs[name])
        assert bs[name]["u"].shape == (out_f,)
        assert bs[name]["v"].shape == (in_f,)


def test_plateau_scheduler_matches_torch_semantics():
    """Replicate torch ReduceLROnPlateau(mode=min, patience=2, factor=0.5)
    behavior on a scripted loss sequence."""
    s = PlateauScheduler(lr=1.0, patience=2, factor=0.5, threshold=1e-4)
    lrs = [s.step(v) for v in [10.0, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.0]]
    # torch: bad epochs accumulate when not better than best*(1-1e-4);
    # decay fires when num_bad > patience
    try:
        import torch
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", patience=2, factor=0.5, threshold=1e-4)
        want = []
        for v in [10.0, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.0]:
            sch.step(v)
            want.append(opt.param_groups[0]["lr"])
        assert lrs == want
    except ImportError:
        assert lrs[-1] < 1.0  # at least one decay happened


@pytest.mark.slow
def test_train_model_end_to_end(rng):
    """MLP learns identity-ish mapping on tiny synthetic data; best-state
    restore and histories have the reference's contract."""
    n_in, n_out = 8, 12
    b = 16
    lr_tr = _batch(rng, b, n_in)
    hr_tr = np.stack([np.ones((n_out, n_out), dtype=np.float32) * m.mean()
                      for m in lr_tr])
    lr_va, hr_va = lr_tr[:4], hr_tr[:4]

    model = SpectralResMLP(num_nodes_input=n_in, num_nodes_output=n_out,
                           num_hidden=20, n_layers=0)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(lr_tr[:2]))
    tr_hist, va_hist, lr_hist, best = train_model(
        model, variables, lr_tr, hr_tr, lr_va, hr_va,
        num_epochs=8, lr=1e-2, batch_size=8, criterion=mse_criterion)
    assert len(tr_hist) == 8 and len(va_hist) == 8
    assert tr_hist[-1] < tr_hist[0]
    assert "params" in best


def test_vector_output_matches_matrix(rng):
    """output='vector' returns exactly the triu vector the matrix mode
    scatters; param trees are interchangeable; vectorized 2-D input gives
    the same result as dense input."""
    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    n_in, n_out = 10, 14
    model_m = SpectralResMLP(num_nodes_input=n_in, num_nodes_output=n_out,
                             num_hidden=16, n_layers=1)
    model_v = SpectralResMLP(num_nodes_input=n_in, num_nodes_output=n_out,
                             num_hidden=16, n_layers=1, output="vector")
    x = jnp.asarray(_batch(rng, 3, n_in))
    variables = model_m.init({"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)}, x)
    mat = model_m.apply(variables, x, train=False)
    vec = model_v.apply(variables, x, train=False)
    rows, cols = triu_indices_rowmajor(n_out)
    np.testing.assert_array_equal(np.asarray(mat)[:, rows, cols],
                                  np.asarray(vec))
    r_in, c_in = triu_indices_rowmajor(n_in)
    vec2 = model_v.apply(variables, x[:, r_in, c_in], train=False)
    np.testing.assert_array_equal(np.asarray(vec), np.asarray(vec2))


def test_triu_mse_criterion_matches_matrix_mse(rng):
    """Vector-space criterion == matrix-space MSE of the scattered
    symmetric prediction, for dense and packed targets."""
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)
    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    n = 14
    b = 3
    rows, cols = triu_indices_rowmajor(n)
    vec = jnp.asarray(rng.random((b, len(rows))).astype(np.float32))
    target = jnp.asarray(_batch(rng, b, n))
    out = jnp.zeros((b, n, n), dtype=vec.dtype)
    out = out.at[:, rows, cols].set(vec)
    out = out + jnp.swapaxes(out, 1, 2)
    want = float(mse_criterion(out, target))
    crit = make_triu_mse_criterion(n)
    got_dense = float(crit(vec, target))
    got_packed = float(crit(vec, jnp.asarray(pack_triu_targets(
        np.asarray(target)))))
    np.testing.assert_allclose(got_dense, want, rtol=1e-6)
    np.testing.assert_allclose(got_packed, want, rtol=1e-6)


@pytest.mark.slow
def test_train_model_device_control_matches_host_control(rng):
    """The generic loop's on-device control (plateau scheduler,
    best-state, early stop as scan carry) must make exactly the
    host-control loop's decisions: same epochs run, same decay epochs,
    matching histories and best params. Aggressive plateau settings
    force decays + early stop so the control logic is exercised; the
    model has dropout AND BatchNorm, so the key choreography and
    batch_stats threading are exercised too."""
    import jax
    from jax.flatten_util import ravel_pytree

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    from fcsr_tpu.data.synthetic import synthesize_teacher_connectomes
    from fcsr_tpu.train.generic_loop import train_model
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)

    lr, hr = synthesize_teacher_connectomes(40, lr_dim=20, hr_dim=32,
                                            seed=3)
    r_in, c_in = triu_indices_rowmajor(20)
    x = lr[:, r_in, c_in]
    y = pack_triu_targets(hr)
    model = SpectralResMLP(num_nodes_input=20, num_nodes_output=32,
                           num_hidden=26, n_layers=1, output="vector")
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           np.zeros((2, 20, 20), np.float32))
    kw = dict(num_epochs=14, lr=0.05, batch_size=8, seed=5,
              criterion=make_triu_mse_criterion(32), patience=1,
              plateau_threshold=0.5, plateau_factor=0.05)
    th, vh, lh, bv = train_model(model, variables, x[:30], y[:30],
                                 x[30:], y[30:],
                                 control_chunk_epochs=5, **kw)
    th2, vh2, lh2, bv2 = train_model(model, variables, x[:30], y[:30],
                                     x[30:], y[30:],
                                     host_control=True, **kw)
    assert len(th) == len(th2) and len(vh) == len(vh2)
    np.testing.assert_allclose(th, th2, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(vh, vh2, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(lh, lh2, rtol=1e-6)
    dec = [i for i in range(1, len(lh)) if lh[i] != lh[i - 1]]
    dec2 = [i for i in range(1, len(lh2)) if lh2[i] != lh2[i - 1]]
    assert dec == dec2 and len(dec) >= 1  # decays really fired
    f1 = np.asarray(ravel_pytree(bv)[0])
    f2 = np.asarray(ravel_pytree(bv2)[0])
    # ~0.1% of params drift to ~2e-4: AdamW rsqrt amplifies last-ulp
    # fusion differences between the scan-embedded and standalone
    # compiles (histories above are tight)
    np.testing.assert_allclose(f1, f2, atol=5e-4)


@pytest.mark.slow
def test_train_model_validate_every(rng):
    """validate_every > 1 under on-device control: val/lr histories have
    one entry per validate epoch and the final epoch is always
    validated (reference semantics, utils/training.py:114)."""
    import jax

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    from fcsr_tpu.data.synthetic import synthesize_teacher_connectomes
    from fcsr_tpu.train.generic_loop import train_model
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)

    lr, hr = synthesize_teacher_connectomes(24, lr_dim=20, hr_dim=32,
                                            seed=4)
    r_in, c_in = triu_indices_rowmajor(20)
    x = lr[:, r_in, c_in]
    y = pack_triu_targets(hr)
    model = SpectralResMLP(num_nodes_input=20, num_nodes_output=32,
                           num_hidden=26, output="vector")
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           np.zeros((2, 20, 20), np.float32))
    th, vh, lh, _ = train_model(model, variables, x[:18], y[:18],
                                x[18:], y[18:], num_epochs=5,
                                validate_every=2, batch_size=6,
                                criterion=make_triu_mse_criterion(32),
                                seed=1)
    assert len(th) == 5
    assert len(vh) == 3 == len(lh)  # epochs 2, 4 and the final 5th


def test_torch_batchnorm_matches_torch_exactly():
    """TorchBatchNorm vs torch.nn.BatchNorm1d: train-mode outputs,
    running stats after several steps (torch updates running_var with
    the UNBIASED batch variance — flax's nn.BatchNorm does not), and
    eval-mode outputs, all to f32 tolerance."""
    import torch

    from fcsr_tpu.models.mlp import TorchBatchNorm

    rng = np.random.default_rng(0)
    feat, batches = 7, [5, 8, 3]
    xs = [rng.normal(size=(b, feat)).astype(np.float32) for b in batches]

    tbn = torch.nn.BatchNorm1d(feat, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.normal(size=feat).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.normal(size=feat).astype(np.float32)))

    model = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
    variables = model.init(jax.random.PRNGKey(0), xs[0],
                           use_running_average=False)
    variables = {
        "params": {"scale": tbn.weight.detach().numpy(),
                   "bias": tbn.bias.detach().numpy()},
        "batch_stats": variables["batch_stats"],
    }

    tbn.train()
    for x in xs:
        t_out = tbn(torch.from_numpy(x)).detach().numpy()
        j_out, updates = model.apply(variables, x,
                                     use_running_average=False,
                                     mutable=["batch_stats"])
        variables = {**variables, "batch_stats": updates["batch_stats"]}
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-6)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-6, atol=1e-7)

    tbn.eval()
    x = rng.normal(size=(4, feat)).astype(np.float32)
    t_out = tbn(torch.from_numpy(x)).detach().numpy()
    j_out = model.apply(variables, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-6)


def test_sndense_matches_torch_spectral_norm_exactly():
    """SNDense vs torch.nn.utils.spectral_norm(Linear): train-mode
    forwards (power iteration + sigma), the stored u/v, AND the
    eval-mode forward (torch freezes the stored pair — flax's
    nn.SpectralNorm re-iterates, which is why it was replaced).

    atol=1e-5 on outputs of magnitude ~10 (~1e-6 relative): f32
    contraction order differs between torch and XLA:CPU, and the
    persistent AOT cache can serve programs compiled with different
    instruction selection than the running host."""
    import torch
    from torch.nn.utils import spectral_norm

    from fcsr_tpu.models.mlp import SNDense

    rng = np.random.default_rng(1)
    in_f, out_f = 9, 5
    tlin = spectral_norm(torch.nn.Linear(in_f, out_f))
    with torch.no_grad():
        tlin.weight_orig.copy_(torch.from_numpy(
            rng.normal(size=(out_f, in_f)).astype(np.float32)))
        tlin.bias.copy_(torch.from_numpy(
            rng.normal(size=out_f).astype(np.float32)))

    model = SNDense(out_f)
    variables = {
        "params": {"kernel": tlin.weight_orig.detach().numpy().T,
                   "bias": tlin.bias.detach().numpy()},
        "batch_stats": {"u": tlin.weight_u.detach().numpy().copy(),
                        "v": tlin.weight_v.detach().numpy().copy()},
    }

    # eval BEFORE any training step: frozen-(u,v) sigma
    x = rng.normal(size=(3, in_f)).astype(np.float32)
    tlin.eval()
    with torch.no_grad():
        t_out = tlin(torch.from_numpy(x)).numpy()
    j_out = model.apply(variables, x, update_stats=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

    tlin.train()
    for _ in range(3):
        x = rng.normal(size=(4, in_f)).astype(np.float32)
        with torch.no_grad():
            t_out = tlin(torch.from_numpy(x)).numpy()
        j_out, upd = model.apply(variables, x, update_stats=True,
                                 mutable=["batch_stats"])
        variables = {**variables, "batch_stats": upd["batch_stats"]}
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["u"]),
        tlin.weight_u.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["v"]),
        tlin.weight_v.detach().numpy(), atol=1e-5)

    tlin.eval()
    x = rng.normal(size=(6, in_f)).astype(np.float32)
    with torch.no_grad():
        t_out = tlin(torch.from_numpy(x)).numpy()
    j_out = model.apply(variables, x, update_stats=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

def test_train_model_folds_matches_sequential_exactly(rng):
    """The fold-parallel vmapped control program must reproduce F
    sequential train_model runs fold-for-fold. This test uses a
    BN-free/SN-free model where EVERY parameter direction affects the
    loss, so trajectories must agree to float-reassociation tolerance
    (SpectralResMLP has exactly-degenerate directions — pre-BN biases,
    SN-kernel radial scale — whose zero analytic gradients make Adam a
    float-noise random walk at lr scale under ANY two different
    compilations; see the companion control-equivalence test)."""
    import flax.linen as fnn
    import jax
    from jax.flatten_util import ravel_pytree

    from fcsr_tpu.train.generic_loop import (mse_criterion, train_model,
                                             train_model_folds)

    class TinyMLP(fnn.Module):
        @fnn.compact
        def __call__(self, x, train: bool = False):
            x = fnn.Dense(16)(x)
            x = fnn.Dropout(0.1, deterministic=not train)(x)
            x = fnn.leaky_relu(x)
            return fnn.Dense(12)(x)

    rng_np = np.random.default_rng(0)
    x = rng_np.normal(size=(40, 10)).astype(np.float32)
    w_true = rng_np.normal(size=(10, 12)).astype(np.float32)
    y = x @ w_true + 0.05 * rng_np.normal(size=(40, 12)).astype(np.float32)

    model = TinyMLP()
    folds = [(np.arange(0, 30), np.arange(30, 40)),
             (np.arange(10, 40), np.arange(0, 10)),
             (np.r_[0:10, 20:40], np.arange(10, 20))]
    seeds = [5, 6, 7]
    inits = [model.init({"params": jax.random.PRNGKey(j),
                         "dropout": jax.random.PRNGKey(100 + j)},
                        np.zeros((2, 10), np.float32)) for j in range(3)]
    kw = dict(num_epochs=14, lr=0.05, batch_size=8,
              criterion=mse_criterion, patience=1,
              plateau_threshold=1e-3, plateau_factor=0.05)

    stack = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(v) for v in xs]), *inits)
    tr_idx = np.stack([tr for tr, _ in folds])
    va_idx = np.stack([va for _, va in folds])
    yva_f = y[va_idx].copy()
    # fold 1 gets NOISE val targets: its val loss never improves, so its
    # plateau/early-stop schedule diverges from the other folds' —
    # proving the vmapped control state is genuinely per-fold
    yva_f[1] = rng_np.normal(size=yva_f[1].shape).astype(np.float32)
    par = train_model_folds(model, stack, x[tr_idx], y[tr_idx],
                            x[va_idx], yva_f, seeds=seeds,
                            control_chunk_epochs=5, **kw)

    lengths = set()
    for j, (tr, va) in enumerate(folds):
        th, vh, lh, bv = train_model(model, inits[j], x[tr], y[tr],
                                     x[va], yva_f[j], seed=seeds[j],
                                     control_chunk_epochs=5, **kw)
        thp, vhp, lhp, bvp = par[j]
        assert len(thp) == len(th) and len(vhp) == len(vh), j
        lengths.add(len(thp))
        np.testing.assert_allclose(thp, th, rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(vhp, vh, rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(lhp, lh, rtol=1e-6)
        f1 = np.asarray(ravel_pytree(bvp)[0])
        f2 = np.asarray(ravel_pytree(bv)[0])
        np.testing.assert_allclose(f1, f2, atol=5e-4)
    # aggressive plateau settings actually diverged the fold controls
    assert len(lengths) > 1 or len({tuple(p[2]) for p in par}) > 1


def test_train_model_folds_control_equivalence_spectral(rng):
    """Fold-parallel vs sequential on the REAL SpectralResMLP: the
    CONTROL decisions (epochs run, plateau decay schedule) and the
    train-loss trajectories must match tightly. Best-param trees and
    val losses are compared only loosely and functionally: the model
    has exactly-degenerate parameter directions (any pre-BN bias shift
    is removed by train-mode BN; an SNDense kernel's radial scale
    cancels in k/sigma), whose analytically-zero gradients are float
    noise in practice — Adam normalizes that noise to full-lr steps,
    so ANY two different compilations (vmapped vs not, and equally the
    torch reference vs itself at a different fusion) random-walk apart
    along them without changing the function. Measured here: train
    losses agree to 1e-7 while the pre-BN bias drifts O(0.1); val
    losses feel it only through running-stat lag (~2e-4)."""
    import jax

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    from fcsr_tpu.data.synthetic import synthesize_teacher_connectomes
    from fcsr_tpu.train.generic_loop import train_model, train_model_folds
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)

    lr, hr = synthesize_teacher_connectomes(40, lr_dim=20, hr_dim=32,
                                            seed=3)
    r_in, c_in = triu_indices_rowmajor(20)
    x = lr[:, r_in, c_in]
    y = pack_triu_targets(hr)
    model = SpectralResMLP(num_nodes_input=20, num_nodes_output=32,
                           num_hidden=26, n_layers=1, output="vector")
    folds = [(np.arange(0, 30), np.arange(30, 40)),
             (np.arange(10, 40), np.arange(0, 10)),
             (np.r_[0:10, 20:40], np.arange(10, 20))]
    seeds = [5, 6, 7]
    inits = [model.init({"params": jax.random.PRNGKey(j),
                         "dropout": jax.random.PRNGKey(100 + j)},
                        np.zeros((2, 20, 20), np.float32))
             for j in range(3)]
    kw = dict(num_epochs=14, lr=0.05, batch_size=8,
              criterion=make_triu_mse_criterion(32), patience=1,
              plateau_threshold=0.5, plateau_factor=0.05)

    stack = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(v) for v in xs]), *inits)
    tr_idx = np.stack([tr for tr, _ in folds])
    va_idx = np.stack([va for _, va in folds])
    par = train_model_folds(model, stack, x[tr_idx], y[tr_idx],
                            x[va_idx], y[va_idx], seeds=seeds,
                            control_chunk_epochs=5, **kw)

    for j, (tr, va) in enumerate(folds):
        th, vh, lh, bv = train_model(model, inits[j], x[tr], y[tr],
                                     x[va], y[va], seed=seeds[j],
                                     control_chunk_epochs=5, **kw)
        thp, vhp, lhp, bvp = par[j]
        assert len(thp) == len(th) and len(vhp) == len(vh), j
        np.testing.assert_allclose(thp, th, rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(lhp, lh, rtol=1e-6)  # same decays
        # degenerate-direction drift bounds the val agreement (above)
        np.testing.assert_allclose(vhp, vh, rtol=2e-2, atol=5e-4)
        # functional equality of the best states: eval-mode predictions
        # agree despite the degenerate-direction param drift
        pred_p = model.apply(bvp, x[va], train=False)
        pred_s = model.apply(bv, x[va], train=False)
        np.testing.assert_allclose(np.asarray(pred_p),
                                   np.asarray(pred_s), atol=5e-3)
