"""CI smoke of the north-star parity proof: weight-transplant trajectory
comparison against the ACTUAL torch reference (read-only checkout at
/root/reference). Full-scale results live in PARITY.md / outputs/parity/;
this is the small always-on version (2 epochs x 8 subjects = 16 steps).

Skipped automatically when the reference checkout is absent.
"""

import importlib.util
import os

import numpy as np
import pytest

REFERENCE = "/root/reference"
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools",
                     "parity_vs_reference.py")

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted")


def _tools():
    spec = importlib.util.spec_from_file_location("parity_tools", TOOLS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_torch_interop_roundtrip():
    """flax -> torch-state -> flax is the identity on the param tree."""
    import jax

    from fcsr_tpu.iox.torch_interop import (flax_to_reference_state,
                                            reference_state_to_flax)
    from fcsr_tpu.train import GSRTrainConfig, init_gsr

    cfg = GSRTrainConfig()
    _, params, _, _ = init_gsr(cfg, jax.random.PRNGKey(3))
    state = flax_to_reference_state(params)
    assert state["layer.weights"].shape == (268, 160)
    assert state["net.start_gcn.proj.weight"].shape == (268, 160)  # (out,in)
    assert state["gc1.weight"].shape == (268, 268)
    back = reference_state_to_flax(state)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


@needs_reference
@pytest.mark.slow
def test_torch_state_dict_names_match_reference_model():
    """Our converter's key set is exactly the reference GSRNet's
    state_dict key set (so transplants load without strict=False)."""
    import sys

    import jax
    import torch

    from fcsr_tpu.iox.torch_interop import flax_to_reference_state
    from fcsr_tpu.train import GSRTrainConfig, init_gsr

    sys.path.insert(0, REFERENCE)
    from models.gsr_model import GSRNet as RefGSRNet  # noqa: E402

    class Args:
        lr_dim, hr_dim, hidden_dim, padding = 160, 268, 268, 0

    ref = RefGSRNet([0.9, 0.7, 0.6, 0.5], Args())
    _, params, _, _ = init_gsr(GSRTrainConfig(), jax.random.PRNGKey(0))
    state = flax_to_reference_state(params)
    assert set(state) == set(ref.state_dict())
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in state.items()})


@needs_reference
@pytest.mark.slow
def test_transplant_trajectory_parity_smoke():
    """Identical init + identical data + identical eigenvectors ->
    per-step losses and final val MAE agree (f32, 16 steps)."""
    import torch

    from fcsr_tpu.data import load_or_synthesize

    tools = _tools()
    epochs, n, n_train, n_val = 2, 12, 8, 4
    lr, lmbda = 1e-3, 16.0
    data = load_or_synthesize(None, n_train=n, n_test=1, seed=42,
                              flavor="lift")

    u_lr, u_hr_red = tools.torch_spectral(data["lr_train"][:n_train],
                                          data["hr_train"][:n_train],
                                          torch.float32)
    init_state, ref_losses, _, ref_mae = tools.run_reference_transplant(
        data, epochs, lr, lmbda, n_train, n_val)
    our_losses, _, our_mae = tools.run_ours_transplant(
        data, init_state, u_lr, u_hr_red, epochs, lr, lmbda, n_train, n_val)

    d = np.abs(ref_losses - our_losses)
    rel = d / np.maximum(np.abs(ref_losses), 1e-12)
    # first step: pure forward/backward/Adam parity, no trajectory drift
    assert d[0, 0] < 1e-5, f"first-step loss delta {d[0, 0]}"
    # whole trajectory: relative agreement at f32 rounding scale
    assert rel.max() < 2e-3, f"max relative loss delta {rel.max()}"
    # the north-star acceptance criterion
    assert abs(ref_mae - our_mae) < 1e-3, (ref_mae, our_mae)


@needs_reference
@pytest.mark.slow
def test_gat_transplant_forward_bitwise():
    """The GAT family's transplant smoke: the ACTUAL reference GraphUnet
    (imported from /root/reference/unet-transformer.py through the
    plain-torch PyG shim) and our flax GATGraphUnet agree from
    transplanted weights and identical SVD features to summation-order
    rounding (last-ulp f32: torch einsum vs XLA matmul accumulate in
    different orders at realistic weight magnitudes; under the old
    too-small shim init the forwards happened to be bitwise equal)."""
    import sys

    import jax
    import torch

    tools_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    sys.path.insert(0, tools_dir)
    mod = _tools()._reference_unet_module()

    from fcsr_tpu.iox.torch_interop import (flax_to_gat_reference_state,
                                            gat_reference_state_to_flax)
    from fcsr_tpu.train.gat_loop import GATTrainConfig

    torch.manual_seed(0)
    tm = mod.GraphUnet(ks=[0.5, 0.5, 0.5], n_nodes=160, m_nodes=268,
                       dim=16, act=torch.relu, drop_p=0.0)
    tm.eval()
    state = {k: v.detach().numpy().copy()
             for k, v in tm.state_dict().items()}

    rng = np.random.default_rng(0)
    a = rng.random((160, 160)).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    at = torch.from_numpy(a)
    an = mod.symmetric_normalize(at + torch.eye(160))
    u, _, _ = torch.svd(an)
    x = u[:, :16]
    with torch.no_grad():
        out_t, _, _ = tm.forward(A=at, X=x)

    model = GATTrainConfig(drop_p=0.0).model()
    variables = gat_reference_state_to_flax(state)
    out_j, _, _ = model.apply(
        {"params": jax.tree.map(np.asarray, variables["params"])},
        np.asarray(a), x=np.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=2e-6, atol=2e-7)

    # the converter round-trips exactly and the key set matches the
    # real torch model's state_dict (transplants load strict)
    rt = flax_to_gat_reference_state(variables)
    assert set(rt) == set(state)
    for k in state:
        np.testing.assert_array_equal(rt[k], state[k])


@needs_reference
@pytest.mark.slow
def test_gat_transplant_trajectory_smoke():
    """2 epochs x 8 subjects through BOTH implementations' shipped
    training semantics from one transplanted init: epoch losses and
    final val MAE must agree to float32-trajectory tolerance."""
    import types

    mod = _tools()
    args = types.SimpleNamespace(epochs=2, n=12, lr=1e-3, tpu=False,
                                 f64=False)
    report = mod.run_gat_transplant(args)
    assert report["first_epoch_loss_delta"] < 1e-5
    assert report["train_loss_delta_max"] < 1e-3
    assert report["final_val_mae_delta"] < 1e-3


@pytest.mark.slow
def test_mlp_transplant_smoke():
    """MLP-family transplant parity smoke (VERDICT r3 item 2): the
    reconstructed notebook SpectralResMLP v2 in torch vs our shipped
    trainer from one transplanted init — f64 first-batch probe must be
    at machine epsilon, short f32 trajectories must track, and the
    u/v/BN-stat transplant must round-trip."""
    import torch  # noqa: F401  (skip cleanly if torch were absent)

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.iox.torch_interop import (flax_to_mlp_reference_state,
                                            mlp_reference_state_to_flax)

    mod = _tools()
    data = load_or_synthesize(None, n_train=18, n_test=1, seed=42)
    data = {
        "lr_train": np.asarray(data["lr_train"][:, :20, :20],
                               np.float32),
        "hr_train": np.asarray(data["hr_train"][:, :32, :32],
                               np.float32),
    }
    n_train, n_val = 12, 6

    init_state, ref_tr, ref_val, ref_dec, ref_best, ref_mae = \
        mod.run_mlp_reference_transplant(data, 3, 0.01, n_train, n_val,
                                         hidden=48, n_layers=1)

    # converters round-trip through the torch naming exactly
    rt = flax_to_mlp_reference_state(
        mlp_reference_state_to_flax(init_state))
    for k, v in init_state.items():
        # constant buffers (triu masks) and torch bookkeeping counters
        # have no flax-side state to round-trip through
        if k.endswith(("num_batches_tracked", "_mask")):
            continue
        np.testing.assert_array_equal(rt[k], v, err_msg=k)

    probe = mod.run_mlp_first_step_probe(data, init_state, n_train,
                                         hidden=48, n_layers=1)
    assert probe["loss_delta"] < 1e-12, probe
    assert probe["max_forward_delta"] < 1e-11, probe
    assert probe["max_grad_delta"] < 1e-12, probe

    our_tr, our_val, our_dec, our_best, our_mae = \
        mod.run_mlp_ours_transplant(data, init_state, 3, 0.01, n_train,
                                    n_val, hidden=48, n_layers=1)
    d_tr = np.abs(np.asarray(ref_tr) - np.asarray(our_tr)).max()
    d_val = np.abs(np.asarray(ref_val) - np.asarray(our_val)).max()
    assert d_tr < 1e-4, (ref_tr, our_tr)
    assert d_val < 1e-4, (ref_val, our_val)
    assert ref_dec == our_dec and ref_best == our_best
    assert abs(ref_mae - our_mae) < 1e-3, (ref_mae, our_mae)


@needs_reference
@pytest.mark.slow
def test_gsr_transplant_full_schedule_smoke(tmp_path, monkeypatch):
    """The exact code path that produced
    outputs/parity/gsr_transplant_full_schedule.json (round 5: 5-fold
    KFold(42) x 167 x 200 epochs, max final-val-MAE delta 2.2e-4) at toy
    scale: 2 folds x 2 epochs x 9 subjects, per-fold deltas bounded."""
    import argparse

    tools = _tools()
    monkeypatch.chdir(tmp_path)
    args = argparse.Namespace(splits=2, n=9, epochs=2, lr=1e-4,
                              lmbda=16.0, f64=False, tpu=False)
    report = tools.run_gsr_transplant_full(args)
    assert report["family"] == "gsr"
    assert len(report["folds"]) == 2
    for rep in report["folds"]:
        assert rep["first_step_loss_delta"] < 1e-5
        assert rep["final_val_mae_delta"] < 1e-3
    assert (tmp_path / "outputs" / "parity"
            / "gsr_transplant_full_schedule.json").exists()
