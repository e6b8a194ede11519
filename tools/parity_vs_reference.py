#!/usr/bin/env python
"""Cross-implementation parity harness vs the ACTUAL reference PyTorch
GSR-Net (mounted read-only at /root/reference — its GSR path has no PyG
dependency).

Two modes:

* default — independent-init comparison: train both implementations on
  IDENTICAL synthetic data and hyperparameters with their own random
  inits; compare val MAE/PCC (equivalence of behavior).
* ``--transplant`` — the north-star proof: export ONE set of initial
  weights from the torch reference, transplant it into our flax tree
  (fcsr_tpu/iox/torch_interop.py), train BOTH implementations through the
  exact sequential-Adam schedule on identical data, and compare
  per-step losses, final parameters, and final val MAE. With ``--f64``
  both sides run in float64, which isolates semantic differences from
  float32 rounding (deltas at the 1e-9 level = the two programs compute
  the same math).

Results are recorded in PARITY.md. Usage:
    python tools/parity_vs_reference.py [--epochs 30] [--n 60]
    python tools/parity_vs_reference.py --transplant [--f64] [--epochs 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = "/root/reference"


def _reference_modules():
    sys.path.insert(0, REFERENCE)
    from models.gsr_model import GSRNet  # noqa: E402
    from utils.preprocessing import (normalize_adj_torch,  # noqa: E402
                                     pad_HR_adj, unpad)
    return GSRNet, normalize_adj_torch, pad_HR_adj, unpad


def _ref_args():
    class Args:
        pass

    args = Args()
    args.lr_dim, args.hr_dim, args.hidden_dim, args.padding = 160, 268, 268, 0
    return args


# ---------------------------------------------------------------------------
# Independent-init mode (behavior equivalence)
# ---------------------------------------------------------------------------

def run_reference(data, epochs, lr, lmbda, n_train, n_val):
    import numpy as np
    import torch
    from scipy.stats import pearsonr

    GSRNet, _, pad_HR_adj, unpad = _reference_modules()
    args = _ref_args()

    torch.manual_seed(0)
    model = GSRNet([0.9, 0.7, 0.6, 0.5], args)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    crit = torch.nn.L1Loss()
    tr_lr, tr_hr = data["lr_train"][:n_train], data["hr_train"][:n_train]
    for _ in range(epochs):
        for lr_m, hr_m in zip(tr_lr, tr_hr):
            model.train()
            opt.zero_grad()
            out, net_outs, start_outs, _ = model(
                torch.from_numpy(lr_m).float())
            out = unpad(out, args.padding)
            hr_t = torch.from_numpy(hr_m).float()
            _, u_hr = torch.linalg.eigh(pad_HR_adj(hr_t, args.padding),
                                        UPLO="U")
            loss = (lmbda * crit(net_outs, start_outs)
                    + crit(model.layer.weights, u_hr[:, :160])
                    + crit(out, hr_t))
            loss.backward()
            opt.step()

    model.eval()
    iu = np.triu_indices(268, 1)
    preds, gts = [], []
    with torch.no_grad():
        for lr_m, hr_m in zip(data["lr_train"][n_train:n_train + n_val],
                              data["hr_train"][n_train:n_train + n_val]):
            out, _, _, _ = model(torch.from_numpy(lr_m).float())
            preds.append(out.numpy()[iu])
            g = hr_m.copy()
            np.fill_diagonal(g, 1.0)
            gts.append(g[iu])
    p, g = np.concatenate(preds), np.concatenate(gts)
    return float(np.abs(p - g).mean()), float(pearsonr(p, g)[0])


def run_ours(data, epochs, lr, lmbda, n_train, n_val):
    import jax
    import numpy as np
    from scipy.stats import pearsonr

    from fcsr_tpu.train import (GSRTrainConfig, evaluate_gsr, init_gsr,
                                train_gsr_fold)

    cfg = GSRTrainConfig(epochs=epochs, lr=lr, lmbda=lmbda)
    model, params, tx, opt = init_gsr(cfg, jax.random.PRNGKey(0))
    params, opt, _ = train_gsr_fold(params, opt, model, tx, cfg,
                                    data["lr_train"][:n_train],
                                    data["hr_train"][:n_train])
    _, preds, gts = evaluate_gsr(params, model, cfg,
                                 data["lr_train"][n_train:n_train + n_val],
                                 data["hr_train"][n_train:n_train + n_val])
    iu = np.triu_indices(268, 1)
    p = np.concatenate([m[iu] for m in preds])
    g = np.concatenate([m[iu] for m in gts])
    return float(np.abs(p - g).mean()), float(pearsonr(p, g)[0])


# ---------------------------------------------------------------------------
# Weight-transplant mode (trajectory-level parity, the north-star proof)
# ---------------------------------------------------------------------------

def torch_spectral(lr_stack, hr_stack, torch_dtype):
    """Export the eigendecompositions EXACTLY as the reference computes
    them in-graph: u_lr = eigh(normalize_adj_torch(lr), UPLO='U')
    (ref: models/layers.py:27 — bitwise-identical to the value the torch
    forward recomputes every step) and u_hr from the padded HR label
    (ref: utils/gsr_train.py:33-36). Feeding BOTH implementations these
    arrays removes eigh-backend/UPLO divergence from the comparison."""
    import numpy as np
    import torch

    _, normalize_adj_torch, pad_HR_adj, _ = _reference_modules()
    u_lrs, u_hrs = [], []
    for lr_m in lr_stack:
        a = normalize_adj_torch(torch.from_numpy(lr_m).to(torch_dtype))
        _, u = torch.linalg.eigh(a, UPLO="U")
        u_lrs.append(u.numpy())
    for hr_m in hr_stack:
        padded = pad_HR_adj(torch.from_numpy(hr_m).to(torch_dtype), 0)
        _, u = torch.linalg.eigh(padded.to(torch_dtype), UPLO="U")
        u_hrs.append(u.numpy()[:, :160])
    return np.stack(u_lrs), np.stack(u_hrs)


def run_reference_transplant(data, epochs, lr, lmbda, n_train, n_val,
                             f64=False, seed=0, init_state=None):
    """Instrumented reference training run: returns (init_state_np,
    per_step_losses (epochs, n_train), final_state_np, val_mae).
    ``init_state`` (numpy state_dict) overrides the fresh seeded init —
    used for the torch-vs-torch f32/f64 chaos control."""
    import numpy as np
    import torch

    GSRNet, _, pad_HR_adj, unpad = _reference_modules()
    args = _ref_args()
    tdt = torch.float64 if f64 else torch.float32
    if f64:
        # the reference forward builds torch.eye(...) in the DEFAULT dtype
        # (ref: models/gsr_model.py:24); the model must see f64 there
        torch.set_default_dtype(torch.float64)

    torch.manual_seed(seed)
    model = GSRNet([0.9, 0.7, 0.6, 0.5], args)
    if f64:
        model.double()
    if init_state is not None:
        model.load_state_dict({k: torch.from_numpy(np.asarray(v)).to(tdt)
                               for k, v in init_state.items()})
    init_state = {k: v.detach().numpy().copy()
                  for k, v in model.state_dict().items()}

    opt = torch.optim.Adam(model.parameters(), lr=lr)
    crit = torch.nn.L1Loss()
    tr_lr = data["lr_train"][:n_train]
    tr_hr = data["hr_train"][:n_train]
    # hoist the constant per-subject HR eigendecomposition (the reference
    # recomputes it every step; the value is identical — same inputs)
    u_hr_all = [torch.linalg.eigh(
        pad_HR_adj(torch.from_numpy(h).to(tdt), 0).to(tdt),
        UPLO="U")[1][:, :160] for h in tr_hr]

    losses = np.zeros((epochs, n_train), dtype=np.float64)
    for e in range(epochs):
        for j, (lr_m, hr_m) in enumerate(zip(tr_lr, tr_hr)):
            model.train()
            opt.zero_grad()
            out, net_outs, start_outs, _ = model(
                torch.from_numpy(lr_m).to(tdt))
            out = unpad(out, args.padding)
            hr_t = torch.from_numpy(hr_m).to(tdt)
            loss = (lmbda * crit(net_outs, start_outs)
                    + crit(model.layer.weights, u_hr_all[j])
                    + crit(out, hr_t))
            loss.backward()
            opt.step()
            losses[e, j] = loss.item()

    final_state = {k: v.detach().numpy().copy()
                   for k, v in model.state_dict().items()}
    model.eval()
    maes = []
    with torch.no_grad():
        for lr_m, hr_m in zip(data["lr_train"][n_train:n_train + n_val],
                              data["hr_train"][n_train:n_train + n_val]):
            out, _, _, _ = model(torch.from_numpy(lr_m).to(tdt))
            g = hr_m.astype(np.float64).copy()
            np.fill_diagonal(g, 1.0)
            maes.append(np.abs(out.numpy() - g).mean())
    if f64:
        torch.set_default_dtype(torch.float32)
    return init_state, losses, final_state, float(np.mean(maes))


def run_ours_transplant(data, init_state, u_lr, u_hr_red, epochs, lr, lmbda,
                        n_train, n_val, f64=False):
    """Train OUR shipped trainer (train/gsr_loop.py make_train_fn,
    per-step instrumented) from the transplanted torch init; returns
    (per_step_losses, final_state_np, val_mae)."""
    import jax

    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fcsr_tpu.iox.torch_interop import (flax_to_reference_state,
                                            reference_state_to_flax)
    from fcsr_tpu.train.gsr_loop import GSRTrainConfig, make_train_fn

    dt = np.float64 if f64 else np.float32
    cfg = GSRTrainConfig(epochs=epochs, lr=lr, lmbda=lmbda)
    model = cfg.model()
    params = reference_state_to_flax(init_state, dtype=dt)
    params = jax.tree.map(jnp.asarray, params)
    tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    train_fn = make_train_fn(model, tx, cfg, per_step=True)

    lr_stack = jnp.asarray(data["lr_train"][:n_train], dtype=dt)
    hr_stack = jnp.asarray(data["hr_train"][:n_train], dtype=dt)
    params, opt_state, loss_hist, _ = train_fn(
        params, opt_state, lr_stack, hr_stack,
        jnp.asarray(u_lr, dtype=dt), jnp.asarray(u_hr_red, dtype=dt))
    final_state = flax_to_reference_state(jax.tree.map(np.asarray, params))

    # batched eval forward with torch-exported eigenvectors for the val set
    va_lr = data["lr_train"][n_train:n_train + n_val]
    va_hr = data["hr_train"][n_train:n_train + n_val]
    import torch
    u_va, _ = torch_spectral(va_lr, va_hr[:1],
                             torch.float64 if f64 else torch.float32)

    def fwd(lr_m, u):
        pred, _, _, _ = model.apply(params, lr_m, u_lr=u)
        return pred

    preds = np.asarray(jax.vmap(fwd)(jnp.asarray(va_lr, dtype=dt),
                                     jnp.asarray(u_va, dtype=dt)))
    maes = []
    for p, hr_m in zip(preds, va_hr):
        g = hr_m.astype(np.float64).copy()
        np.fill_diagonal(g, 1.0)
        maes.append(np.abs(p.astype(np.float64) - g).mean())
    return np.asarray(loss_hist, dtype=np.float64), final_state, \
        float(np.mean(maes))


def run_gsr_transplant_full(args):
    """The reference's FULL shipped GSR schedule (ref:
    training_gsr.ipynb cell-4/6; utils/gsr_train.py:11-53): sklearn
    KFold(n_splits, shuffle, random_state=42) over ALL subjects, a fresh
    model per fold, epochs x n_train sequential Adam steps with the
    composite L1 loss — transplant-compared fold by fold. Shipped
    config: --splits 5 --n 167 --epochs 200 --lr 1e-4 --lmbda 16
    (~26 600 steps per fold per side on this host)."""
    import json
    import time

    import numpy as np
    import torch

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices

    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42,
                              flavor="lift")  # same data as the GSR rows
    if args.f64:
        data = {k: np.asarray(v, dtype=np.float64) for k, v in data.items()}
    tdt = torch.float64 if args.f64 else torch.float32
    folds = kfold_indices(args.n, args.splits, seed=42)

    fold_reports = []
    for j, (tr, va) in enumerate(folds):
        t0 = time.time()
        data_f = {
            "lr_train": np.concatenate([data["lr_train"][tr],
                                        data["lr_train"][va]]),
            "hr_train": np.concatenate([data["hr_train"][tr],
                                        data["hr_train"][va]]),
        }
        n_tr, n_va = len(tr), len(va)
        u_lr, u_hr_red = torch_spectral(data_f["lr_train"][:n_tr],
                                        data_f["hr_train"][:n_tr], tdt)
        init_state, ref_losses, ref_final, ref_mae = \
            run_reference_transplant(data_f, args.epochs, args.lr,
                                     args.lmbda, n_tr, n_va, f64=args.f64)
        t_ref = time.time() - t0
        our_losses, our_final, our_mae = run_ours_transplant(
            data_f, init_state, u_lr, u_hr_red, args.epochs, args.lr,
            args.lmbda, n_tr, n_va, f64=args.f64)
        t_ours = time.time() - t0 - t_ref

        d = np.abs(ref_losses - our_losses)
        wdelta = {k: float(np.max(np.abs(
            ref_final[k].astype(np.float64)
            - our_final[k].astype(np.float64)))) for k in ref_final}
        rep = {
            "fold": j, "n_train": n_tr, "n_val": n_va,
            "steps": int(ref_losses.size),
            "first_step_loss_delta": float(d[0, 0]),
            "loss_delta_max": float(d.max()),
            "loss_delta_mean": float(d.mean()),
            "final_step_delta": float(d[-1, -1]),
            "max_final_weight_delta": max(wdelta.values()),
            "final_val_mae_ref": ref_mae,
            "final_val_mae_ours": our_mae,
            "final_val_mae_delta": abs(ref_mae - our_mae),
            "wall_s_ref": round(t_ref, 1), "wall_s_ours": round(t_ours, 1),
        }
        print(json.dumps(rep), flush=True)
        fold_reports.append(rep)

    report = {
        "family": "gsr", "mode": "f64" if args.f64 else "f32",
        "schedule": f"{args.splits}-fold sklearn KFold(shuffle, 42) x "
                    f"{args.epochs} epochs, n={args.n}, lr={args.lr}, "
                    f"lmbda={args.lmbda} (ref training_gsr.ipynb cell-4/6)",
        "folds": fold_reports,
        "mean_final_val_mae_ref": float(np.mean(
            [r["final_val_mae_ref"] for r in fold_reports])),
        "mean_final_val_mae_ours": float(np.mean(
            [r["final_val_mae_ours"] for r in fold_reports])),
        "max_final_val_mae_delta": float(max(
            r["final_val_mae_delta"] for r in fold_reports)),
    }
    out = os.path.join("outputs", "parity",
                       "gsr_transplant_full_schedule.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"written: {out}")
    return report


def run_transplant(args):
    import jax
    if not args.tpu:
        # torch runs on CPU; keep the comparison backend-matched by default
        # (pass --tpu to measure the TPU-vs-torch-CPU hardware delta)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from fcsr_tpu.data import load_or_synthesize

    n_train = args.n * 2 // 3
    n_val = args.n - n_train
    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42,
                              flavor="lift")  # recorded runs used v1 data
    if args.f64:
        data = {k: np.asarray(v, dtype=np.float64) for k, v in data.items()}

    tdt = torch.float64 if args.f64 else torch.float32
    u_lr, u_hr_red = torch_spectral(data["lr_train"][:n_train],
                                    data["hr_train"][:n_train], tdt)

    init_state, ref_losses, ref_final, ref_mae = run_reference_transplant(
        data, args.epochs, args.lr, args.lmbda, n_train, n_val, f64=args.f64)
    our_losses, our_final, our_mae = run_ours_transplant(
        data, init_state, u_lr, u_hr_red, args.epochs, args.lr, args.lmbda,
        n_train, n_val, f64=args.f64)

    d = np.abs(ref_losses - our_losses)
    rel = d / np.maximum(np.abs(ref_losses), 1e-12)
    wdelta = {k: float(np.max(np.abs(ref_final[k].astype(np.float64)
                                     - our_final[k].astype(np.float64))))
              for k in ref_final}
    report = {
        "mode": "f64" if args.f64 else "f32",
        "epochs": args.epochs, "steps": int(ref_losses.size),
        "n_train": n_train, "n_val": n_val,
        "loss_delta_max": float(d.max()),
        "loss_delta_mean": float(d.mean()),
        "loss_rel_delta_max": float(rel.max()),
        "first_step_loss_ref": float(ref_losses[0, 0]),
        "first_step_loss_ours": float(our_losses[0, 0]),
        "final_step_delta": float(d[-1, -1]),
        "max_final_weight_delta": max(wdelta.values()),
        "val_mae_ref": ref_mae, "val_mae_ours": our_mae,
        "val_mae_delta": abs(ref_mae - our_mae),
    }
    for k, v in report.items():
        print(f"{k}: {v}")
    print("\nper-parameter max |final delta|:")
    for k in sorted(wdelta, key=wdelta.get, reverse=True)[:6]:
        print(f"  {k}: {wdelta[k]:.3e}")
    return report


def run_ref_self_check(args):
    """Chaos control: the torch reference trained in f32 vs the torch
    reference trained in f64 FROM THE SAME INIT. Any val-MAE delta here is
    pure float32 rounding sensitivity of the training problem itself (no
    second implementation involved) — the yardstick against which the
    ours-vs-reference f32 delta must be judged."""
    import numpy as np

    from fcsr_tpu.data import load_or_synthesize

    n_train = args.n * 2 // 3
    n_val = args.n - n_train
    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42,
                              flavor="lift")  # recorded runs used v1 data
    data64 = {k: np.asarray(v, dtype=np.float64) for k, v in data.items()}

    init32, losses32, _, mae32 = run_reference_transplant(
        data, args.epochs, args.lr, args.lmbda, n_train, n_val, f64=False)
    _, losses64, _, mae64 = run_reference_transplant(
        data64, args.epochs, args.lr, args.lmbda, n_train, n_val, f64=True,
        init_state=init32)
    d = np.abs(losses32 - losses64)
    report = {
        "mode": "torch-f32 vs torch-f64 (same init)",
        "epochs": args.epochs, "steps": int(losses32.size),
        "loss_delta_max": float(d.max()),
        "final_step_delta": float(d[-1, -1]),
        "val_mae_f32": mae32, "val_mae_f64": mae64,
        "val_mae_delta": abs(mae32 - mae64),
    }
    for k, v in report.items():
        print(f"{k}: {v}")
    return report


# ---------------------------------------------------------------------------
# GAT family transplant (--family gat)
# ---------------------------------------------------------------------------

def _reference_unet_module():
    """Import the ACTUAL reference ``unet-transformer.py`` (the filename
    is not an importable identifier) with the plain-torch PyG shim
    (tools/pyg_shim.py) standing in for torch_geometric."""
    import importlib.util

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyg_shim
    pyg_shim.install()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    spec = importlib.util.spec_from_file_location(
        "ref_unet_transformer", os.path.join(REFERENCE,
                                             "unet-transformer.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def torch_gat_features(mod, stack, dim, f64=False):
    """SVD node features exactly as the reference forward builds them
    (ref: unet-transformer.py:313-317,324-329): torch.svd of the
    normalized (A + I). Exported once and fed to BOTH implementations so
    SVD-backend sign/ordering conventions drop out of the comparison."""
    import numpy as np
    import torch

    tdt = torch.float64 if f64 else torch.float32
    feats = []
    for m in stack:
        a = torch.from_numpy(np.asarray(m)).to(tdt)
        a = a + torch.eye(a.shape[0], dtype=tdt)
        a = mod.symmetric_normalize(a)
        u, _, _ = torch.svd(a)
        feats.append(u[:, :dim].numpy())
    return np.stack(feats)


def run_gat_reference_transplant(mod, data, feats_tr, feats_va, epochs,
                                 lr, n_train, n_val, f64=False):
    """Instrumented reference GAT training: the shipped train_model
    semantics (AdamW wd=0.01, ReduceLROnPlateau(patience=10, thr=1e-2,
    factor=0.1), per-sample steps, early stop lr<1e-5 — ref:
    unet-transformer.py:100-195) with a FIXED sample order and injected
    node features. drop_p=0 for determinism. Returns (init_state,
    train_hist, val_hist, mae_hist, final_state)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    tdt = torch.float64 if f64 else torch.float32
    if f64:
        # forward builds torch.eye in the default dtype
        # (ref: unet-transformer.py:324)
        torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    model = mod.GraphUnet(ks=[0.5, 0.5, 0.5], n_nodes=160, m_nodes=268,
                          dim=16, act=torch.relu, drop_p=0.0)
    if f64:
        model.double()
    init_state = {k: v.detach().numpy().copy()
                  for k, v in model.state_dict().items()}
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", patience=10, threshold=1e-2, factor=0.1)

    tr_lr = [torch.from_numpy(m).to(tdt)
             for m in data["lr_train"][:n_train]]
    tr_hr = [torch.from_numpy(m).to(tdt)
             for m in data["hr_train"][:n_train]]
    va_lr = [torch.from_numpy(m).to(tdt)
             for m in data["lr_train"][n_train:n_train + n_val]]
    va_hr = [torch.from_numpy(m).to(tdt)
             for m in data["hr_train"][n_train:n_train + n_val]]
    x_tr = [torch.from_numpy(f).to(tdt) for f in feats_tr]
    x_va = [torch.from_numpy(f).to(tdt) for f in feats_va]

    train_hist, val_hist, mae_hist = [], [], []
    for _ in range(epochs):
        model.train()
        ep = 0.0
        for j in range(n_train):
            opt.zero_grad()
            out, a_hist, a_recon = model.forward(A=tr_lr[j], X=x_tr[j])
            l = mod.loss(out, tr_hr[j], a_hist, a_recon,
                         intermediate_losses=True)
            l.backward()
            opt.step()
            ep += l.item()
        train_hist.append(ep / n_train)

        model.eval()
        vl = vm = 0.0
        with torch.no_grad():
            for j in range(n_val):
                out, a_hist, a_recon = model.forward(A=va_lr[j],
                                                     X=x_va[j])
                vl += mod.loss(out, va_hr[j], a_hist, a_recon,
                               True).item()
                a = out - torch.diag(torch.diag(out))
                at = va_hr[j] - torch.diag(torch.diag(va_hr[j]))
                vm += F.l1_loss(a, at).item()
        val_hist.append(vl / n_val)
        mae_hist.append(vm / n_val)
        sched.step(val_hist[-1])
        if mod.get_lr(opt) < 1e-5:
            break

    final_state = {k: v.detach().numpy().copy()
                   for k, v in model.state_dict().items()}
    if f64:
        torch.set_default_dtype(torch.float32)
    return init_state, train_hist, val_hist, mae_hist, final_state


def run_gat_ours_transplant(data, init_state, feats_tr, feats_va, epochs,
                            lr, n_train, n_val, f64=False):
    """Our shipped GAT epoch/val programs (train/gat_loop._make_epoch_fn)
    trained from the transplanted torch init through the same schedule:
    fixed order, PlateauScheduler, AdamW wd=0.01, early stop lr<1e-5."""
    import jax
    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fcsr_tpu.iox.torch_interop import (flax_to_gat_reference_state,
                                            gat_reference_state_to_flax)
    from fcsr_tpu.train.gat_loop import GATTrainConfig, _make_epoch_fn
    from fcsr_tpu.train.generic_loop import PlateauScheduler

    dt = jnp.float64 if f64 else jnp.float32
    cfg = GATTrainConfig(epochs=epochs, lr=lr, drop_p=0.0)
    model = cfg.model()
    params = jax.tree.map(
        jnp.asarray,
        gat_reference_state_to_flax(init_state,
                                    dtype=np.float64 if f64
                                    else np.float32)["params"])
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = tx.init(params)
    epoch_fn, val_fn = _make_epoch_fn(model, tx, cfg)

    lr_tr = jnp.asarray(data["lr_train"][:n_train], dt)
    hr_tr = jnp.asarray(data["hr_train"][:n_train], dt)
    lr_va = jnp.asarray(data["lr_train"][n_train:n_train + n_val], dt)
    hr_va = jnp.asarray(data["hr_train"][n_train:n_train + n_val], dt)
    x_tr = jnp.asarray(feats_tr, dt)
    x_va = jnp.asarray(feats_va, dt)

    order = jnp.arange(n_train, dtype=jnp.int32)
    sched = PlateauScheduler(lr, patience=cfg.patience, factor=0.1,
                             threshold=1e-2)
    key = jax.random.PRNGKey(0)  # drop_p=0: stream never touches math
    cur_lr = lr
    train_hist, val_hist, mae_hist = [], [], []
    for _ in range(epochs):
        params, opt_state, key, tr_loss = epoch_fn(
            params, opt_state, lr_tr, hr_tr, x_tr, order, key)
        v_loss, v_mae = val_fn(params, lr_va, hr_va, x_va)
        train_hist.append(float(tr_loss))
        val_hist.append(float(v_loss))
        mae_hist.append(float(v_mae))
        new_lr = sched.step(float(v_loss))
        if new_lr != cur_lr:
            cur_lr = new_lr
            opt_state = opt_state._replace(hyperparams={
                **opt_state.hyperparams,
                "learning_rate": jnp.asarray(cur_lr, jnp.float32)})
        if cur_lr < 1e-5:
            break

    final_state = flax_to_gat_reference_state(
        {"params": jax.tree.map(np.asarray, params)})
    return train_hist, val_hist, mae_hist, final_state


def run_gat_transplant_full(args, mod):
    """The reference's FULL shipped GAT schedule (ref:
    unet-transformer.py:478-541): sklearn KFold(n_splits, shuffle,
    random_state=42) over all subjects, fresh model per fold, 100
    epochs of per-sample AdamW with plateau/best-state/early-stop —
    transplant-compared fold by fold. drop_p=0 for determinism (the
    reference's dropout RNG is implementation-defined)."""
    import json

    import numpy as np

    from fcsr_tpu.data import load_or_synthesize
    from fcsr_tpu.data.datamodule import kfold_indices

    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42,
                              flavor="lift")
    stack = data["lr_train"]
    feats_all = torch_gat_features(mod, stack, 16, f64=args.f64)
    folds = kfold_indices(len(stack), args.splits, seed=42)

    fold_reports = []
    for j, (tr, va) in enumerate(folds):
        data_f = {
            "lr_train": np.concatenate([data["lr_train"][tr],
                                        data["lr_train"][va]]),
            "hr_train": np.concatenate([data["hr_train"][tr],
                                        data["hr_train"][va]]),
        }
        f_tr, f_va = feats_all[tr], feats_all[va]
        n_tr, n_va = len(tr), len(va)
        init_state, ref_trh, ref_valh, ref_mae, _ = \
            run_gat_reference_transplant(mod, data_f, f_tr, f_va,
                                         args.epochs, args.lr, n_tr,
                                         n_va, f64=args.f64)
        our_trh, our_valh, our_mae, _ = run_gat_ours_transplant(
            data_f, init_state, f_tr, f_va, args.epochs, args.lr,
            n_tr, n_va, f64=args.f64)
        n_ep = min(len(ref_trh), len(our_trh))
        rep = {
            "fold": j,
            "epochs_ref": len(ref_trh), "epochs_ours": len(our_trh),
            "train_loss_delta_max": float(np.abs(
                np.asarray(ref_trh[:n_ep])
                - np.asarray(our_trh[:n_ep])).max()),
            "val_loss_delta_max": float(np.abs(
                np.asarray(ref_valh[:n_ep])
                - np.asarray(our_valh[:n_ep])).max()),
            "final_val_mae_ref": float(ref_mae[-1]),
            "final_val_mae_ours": float(our_mae[-1]),
            "final_val_mae_delta": abs(ref_mae[-1] - our_mae[-1]),
        }
        print(json.dumps(rep))
        fold_reports.append(rep)

    report = {
        "family": "gat", "mode": "f64" if args.f64 else "f32",
        "schedule": f"{args.splits}-fold x {args.epochs} epochs, "
                    f"n={args.n}, drop_p=0 "
                    "(ref unet-transformer.py:478-541)",
        "folds": fold_reports,
        "mean_final_val_mae_ref": float(np.mean(
            [r["final_val_mae_ref"] for r in fold_reports])),
        "mean_final_val_mae_ours": float(np.mean(
            [r["final_val_mae_ours"] for r in fold_reports])),
        "max_final_val_mae_delta": float(max(
            r["final_val_mae_delta"] for r in fold_reports)),
    }
    out = os.path.join("outputs", "parity",
                       "gat_transplant_full_schedule.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"written: {out}")
    return report


def run_gat_transplant(args):
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fcsr_tpu.data import load_or_synthesize

    n_train = args.n * 2 // 3
    n_val = args.n - n_train
    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42,
                              flavor="lift")

    if args.f64:
        data = {k: np.asarray(v, dtype=np.float64)
                for k, v in data.items()}
    mod = _reference_unet_module()
    if getattr(args, "splits", 0):
        run_gat_transplant_full(args, mod)
        return
    feats_tr = torch_gat_features(mod, data["lr_train"][:n_train], 16,
                                  f64=args.f64)
    feats_va = torch_gat_features(
        mod, data["lr_train"][n_train:n_train + n_val], 16, f64=args.f64)

    init_state, ref_tr, ref_val, ref_mae, ref_final = \
        run_gat_reference_transplant(mod, data, feats_tr, feats_va,
                                     args.epochs, args.lr, n_train, n_val,
                                     f64=args.f64)
    our_tr, our_val, our_mae, our_final = run_gat_ours_transplant(
        data, init_state, feats_tr, feats_va, args.epochs, args.lr,
        n_train, n_val, f64=args.f64)

    n_ep = min(len(ref_tr), len(our_tr))
    d_tr = np.abs(np.asarray(ref_tr[:n_ep]) - np.asarray(our_tr[:n_ep]))
    d_val = np.abs(np.asarray(ref_val[:n_ep]) - np.asarray(our_val[:n_ep]))
    wdelta = {k: float(np.max(np.abs(
        ref_final[k].astype(np.float64) - our_final[k].astype(np.float64))))
        for k in ref_final}
    report = {
        "family": "gat",
        "mode": "f64" if args.f64 else "f32",
        "epochs_ref": len(ref_tr), "epochs_ours": len(our_tr),
        "first_epoch_loss_ref": float(ref_tr[0]),
        "first_epoch_loss_ours": float(our_tr[0]),
        "first_epoch_loss_delta": abs(ref_tr[0] - our_tr[0]),
        "train_loss_delta_max": float(d_tr.max()),
        "val_loss_delta_max": float(d_val.max()),
        "max_final_weight_delta": max(wdelta.values()),
        "final_val_mae_ref": float(ref_mae[-1]),
        "final_val_mae_ours": float(our_mae[-1]),
        "final_val_mae_delta": abs(ref_mae[-1] - our_mae[-1]),
    }
    for k, v in report.items():
        print(f"{k}: {v}")
    print("\nper-parameter max |final delta| (top 6):")
    for k in sorted(wdelta, key=wdelta.get, reverse=True)[:6]:
        print(f"  {k}: {wdelta[k]:.3e}")
    return report


# ---------------------------------------------------------------------------
# MLP family transplant (--family mlp)
# ---------------------------------------------------------------------------

def _reference_mlp_model(n_in, n_out, hidden, n_layers, dropout, f64=False):
    """The notebook's SuperResMLP v2 RECONSTRUCTED in plain torch from
    its documented architecture (ref: training_template.ipynb cell
    334b874b): spectral-norm Linear + BatchNorm1d + Dropout + LeakyReLU
    input layer, n residual blocks of the same shape (with post-add
    LeakyReLU), spectral-norm Linear + Sigmoid output, scatter into the
    row-major triu mask + symmetrize. Xavier-uniform on every Linear,
    zero biases (the notebook's ``_init_weights``; applied to ``.weight``
    of spectral-norm'd Linears it lands on weight_orig — verified).
    The PyG ``to_dense_adj(Batch)`` entry is data plumbing, not model
    math: this reconstruction takes dense (B, n, n) tensors directly
    (the notebook's very next line reduces to the same triu gather)."""
    import torch
    import torch.nn as nn
    from torch.nn.utils import spectral_norm

    class RefSuperResMLPv2(nn.Module):
        def __init__(self):
            super().__init__()
            input_size = (n_in * (n_in - 1)) // 2
            output_size = (n_out * (n_out - 1)) // 2
            self.register_buffer(
                "input_mask",
                torch.triu(torch.ones(n_in, n_in), diagonal=1).bool())
            self.register_buffer(
                "output_mask",
                torch.triu(torch.ones(n_out, n_out), diagonal=1).bool())
            self.input_layer = nn.Sequential(
                nn.Flatten(start_dim=1),
                spectral_norm(nn.Linear(input_size, hidden)),
                nn.BatchNorm1d(hidden),
                nn.Dropout(dropout),
                nn.LeakyReLU(negative_slope=0.01),
            )
            self.residual_blocks = nn.ModuleList([
                nn.Sequential(
                    spectral_norm(nn.Linear(hidden, hidden)),
                    nn.BatchNorm1d(hidden),
                    nn.Dropout(dropout),
                    nn.LeakyReLU(negative_slope=0.01),
                ) for _ in range(n_layers)])
            self.output_layer = nn.Sequential(
                spectral_norm(nn.Linear(hidden, output_size)),
                nn.Sigmoid(),
            )
            for m in self.modules():
                if isinstance(m, nn.Linear):
                    nn.init.xavier_uniform_(m.weight)
                    if m.bias is not None:
                        nn.init.zeros_(m.bias)

        def forward(self, dense_batch):
            import torch.nn.functional as F
            x = dense_batch[:, self.input_mask]
            x = self.input_layer(x)
            for block in self.residual_blocks:
                residual = x
                x = block(x)
                x = x + residual
                x = F.leaky_relu(x, negative_slope=0.01)
            x = self.output_layer(x)
            b = x.size(0)
            matrix = torch.zeros((b, n_out, n_out), device=x.device,
                                 dtype=x.dtype)
            matrix[:, self.output_mask] = x
            return matrix + matrix.transpose(1, 2)

    model = RefSuperResMLPv2()
    if f64:
        model.double()
    return model


def _mlp_notebook_hidden(n_in, n_out):
    """The notebook's SHIPPED hidden size. Cell 60478db passes
    ``num_hidden_nodes=(input_dim+output_dim)//2`` where cell f5c15b0f
    defines ``input_dim = batch[0].x.shape[0]`` — the NODE count of the
    first graph (160), not the triu-vector length: SuperResMLP's first
    parameter is ``num_nodes_input`` and it derives ``input_size =
    (n*(n-1))//2`` from it, so a vector-length reading would imply an
    (12720*12719)/2-wide input layer. Shipped hidden = (160+268)//2
    = 214."""
    return (n_in + n_out) // 2


def _mlp_batch_plan(n, num_epochs, batch_size, seed):
    """EXACTLY the shipped generic loop's shuffle plan (train/
    generic_loop.py: np.random.default_rng(seed).permutation(n) per
    epoch; n_full full batches then one ragged remainder). The
    reference's own loader order is np.random.shuffle driven and
    implementation-defined (ref: utils/data.py:74-79), so the plan —
    like top-k tie order in the GAT row — is pinned to ours on both
    sides."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return [rng.permutation(n) for _ in range(num_epochs)]


def run_mlp_reference_transplant(data, epochs, lr, n_train, n_val,
                                 batch_size=32, seed=0, f64=False,
                                 hidden=None, n_layers=0):
    """Instrumented reference-semantics training of the reconstructed
    notebook model: the shipped ``train_model`` control flow (AdamW
    lr=0.01 wd=0.01, ReduceLROnPlateau(patience=10, default rel
    threshold 1e-4), grad-clip 1.0, validate every epoch, best-state
    deepcopy on strict improvement, early stop lr<1e-5 — ref:
    utils/training.py:20-155) with a fixed batch plan and a whole-set
    validation batch (the loader's per-batch averaging is batching
    noise, not model semantics). dropout=0 for determinism. Returns
    (init_state, train_hist, val_hist, decay_epochs, best_epoch,
    final_val_mae)."""
    import copy

    import numpy as np
    import torch

    tdt = torch.float64 if f64 else torch.float32
    n_in = data["lr_train"].shape[-1]
    n_out = data["hr_train"].shape[-1]
    hidden = hidden or _mlp_notebook_hidden(n_in, n_out)
    torch.manual_seed(0)
    model = _reference_mlp_model(n_in, n_out, hidden, n_layers,
                                 dropout=0.0, f64=f64)
    init_state = {k: v.detach().numpy().copy()
                  for k, v in model.state_dict().items()}

    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", patience=10)
    crit = torch.nn.MSELoss()

    lr_tr = torch.from_numpy(data["lr_train"][:n_train]).to(tdt)
    hr_tr = torch.from_numpy(data["hr_train"][:n_train]).to(tdt)
    lr_va = torch.from_numpy(
        data["lr_train"][n_train:n_train + n_val]).to(tdt)
    hr_va = torch.from_numpy(
        data["hr_train"][n_train:n_train + n_val]).to(tdt)

    plan = _mlp_batch_plan(n_train, epochs, batch_size, seed)
    train_hist, val_hist, lr_hist = [], [], []
    best_val, best_state, best_epoch = float("inf"), None, -1
    for epoch in range(epochs):
        model.train()
        order = plan[epoch]
        ep_losses = []
        for i in range(0, n_train, batch_size):
            idx = order[i:i + batch_size]
            opt.zero_grad()
            out = model(lr_tr[idx])
            loss = crit(out, hr_tr[idx])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(),
                                           max_norm=1.0)
            opt.step()
            ep_losses.append(loss.item())
        train_hist.append(float(np.mean(ep_losses)))

        model.eval()
        with torch.no_grad():
            vloss = crit(model(lr_va), hr_va).item()
        val_hist.append(vloss)
        sched.step(vloss)
        cur_lr = opt.param_groups[0]["lr"]
        lr_hist.append(cur_lr)
        if vloss < best_val:
            best_val, best_epoch = vloss, epoch
            best_state = copy.deepcopy(model.state_dict())
        if cur_lr < 1e-5:
            break

    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        preds = model(lr_va).numpy()
    off = ~np.eye(n_out, dtype=bool)
    mae = float(np.abs(preds[:, off]
                       - data["hr_train"][n_train:n_train + n_val][:, off]
                       ).mean())
    decays = [e for e in range(1, len(lr_hist))
              if lr_hist[e] != lr_hist[e - 1]]
    return init_state, train_hist, val_hist, decays, best_epoch, mae


def run_mlp_ours_transplant(data, init_state, epochs, lr, n_train, n_val,
                            batch_size=32, seed=0, hidden=None,
                            n_layers=0):
    """Our SHIPPED trainer (train/generic_loop.train_model, on-device
    control, vector-space criterion) from the transplanted torch init.
    Returns (train_hist, val_hist, decay_epochs, best_epoch,
    final_val_mae)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    from fcsr_tpu.iox.torch_interop import mlp_reference_state_to_flax
    from fcsr_tpu.models.mlp import SpectralResMLP
    from fcsr_tpu.train.generic_loop import train_model
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)

    n_in = data["lr_train"].shape[-1]
    n_out = data["hr_train"].shape[-1]
    hidden = hidden or _mlp_notebook_hidden(n_in, n_out)
    model_train = SpectralResMLP(num_nodes_input=n_in,
                                 num_nodes_output=n_out,
                                 num_hidden=hidden, n_layers=n_layers,
                                 dropout=0.0, output="vector")
    model_mat = SpectralResMLP(num_nodes_input=n_in,
                               num_nodes_output=n_out,
                               num_hidden=hidden, n_layers=n_layers,
                               dropout=0.0)
    variables = jax.tree.map(jnp.asarray,
                             mlp_reference_state_to_flax(init_state))

    r_in, c_in = triu_indices_rowmajor(n_in)
    lr_vec = data["lr_train"][:, r_in, c_in].astype(np.float32)
    hr_pack = pack_triu_targets(data["hr_train"]).astype(np.float32)
    tr_h, va_h, lr_h, best_vars = train_model(
        model_train, variables,
        lr_vec[:n_train], hr_pack[:n_train],
        lr_vec[n_train:n_train + n_val], hr_pack[n_train:n_train + n_val],
        num_epochs=epochs, lr=lr, batch_size=batch_size,
        criterion=make_triu_mse_criterion(n_out), seed=seed)

    preds = np.asarray(model_mat.apply(
        best_vars, jnp.asarray(data["lr_train"][n_train:n_train + n_val],
                               jnp.float32), train=False))
    off = ~np.eye(n_out, dtype=bool)
    mae = float(np.abs(preds[:, off]
                       - data["hr_train"][n_train:n_train + n_val][:, off]
                       ).mean())
    decays = [e for e in range(1, len(lr_h)) if lr_h[e] != lr_h[e - 1]]
    best_epoch = int(np.argmin(va_h))
    return tr_h, va_h, decays, best_epoch, mae


def run_mlp_first_step_probe(data, init_state, n_train, f64=True,
                             batch_size=32, seed=0, hidden=None,
                             n_layers=0):
    """Float64 single-batch probe: forward outputs and all parameter
    gradients of the FIRST training batch, reference vs ours, from the
    same transplanted init. Deltas at the 1e-12 level = the two programs
    compute the same math (the GSR/GAT rows' yardstick)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import torch

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    from fcsr_tpu.iox.torch_interop import (flax_to_mlp_reference_state,
                                            mlp_reference_state_to_flax)
    from fcsr_tpu.models.mlp import SpectralResMLP
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)

    n_in = data["lr_train"].shape[-1]
    n_out = data["hr_train"].shape[-1]
    hidden = hidden or _mlp_notebook_hidden(n_in, n_out)

    idx = _mlp_batch_plan(n_train, 1, batch_size, seed)[0][:batch_size]
    lr_b64 = data["lr_train"][idx].astype(np.float64)
    hr_b64 = data["hr_train"][idx].astype(np.float64)

    # torch side
    model = _reference_mlp_model(n_in, n_out, hidden, n_layers,
                                 dropout=0.0, f64=True)
    model.load_state_dict({k: torch.from_numpy(v).double()
                           for k, v in init_state.items()})
    model.train()
    out_t = model(torch.from_numpy(lr_b64))
    loss_t = torch.nn.functional.mse_loss(out_t,
                                          torch.from_numpy(hr_b64))
    loss_t.backward()
    grads_t = {k: p.grad.detach().numpy().copy()
               for k, p in model.named_parameters()}

    # our side (vector-space criterion, f64)
    model_j = SpectralResMLP(num_nodes_input=n_in,
                             num_nodes_output=n_out,
                             num_hidden=hidden, n_layers=n_layers,
                             dropout=0.0, output="vector")
    variables = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64),
        mlp_reference_state_to_flax(init_state, dtype=np.float64))
    r_in, c_in = triu_indices_rowmajor(n_in)
    crit = make_triu_mse_criterion(n_out)
    x_vec = jnp.asarray(lr_b64[:, r_in, c_in])
    t_pack = jnp.asarray(pack_triu_targets(hr_b64))

    params = variables["params"]
    aux = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        pred, _ = model_j.apply({"params": params, **aux}, x_vec,
                                train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
        return crit(pred, t_pack)

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)

    # forward-output delta (matrix space)
    model_mat = SpectralResMLP(num_nodes_input=n_in,
                               num_nodes_output=n_out,
                               num_hidden=hidden, n_layers=n_layers,
                               dropout=0.0)
    out_j, _ = model_mat.apply(variables, jnp.asarray(lr_b64),
                               train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(0)})
    d_out = float(np.max(np.abs(np.asarray(out_j)
                                - out_t.detach().numpy())))

    # gradient deltas via the torch naming (kernel transposes included)
    from fcsr_tpu.iox.torch_interop import flax_to_mlp_reference_state
    g_state = flax_to_mlp_reference_state(
        {"params": jax.tree.map(np.asarray, grads_j),
         "batch_stats": jax.tree.map(np.asarray, aux["batch_stats"])})
    d_grads = {}
    for k, g in grads_t.items():
        ours_key = k.replace(".weight_orig", ".weight_orig")
        if ours_key in g_state:
            d_grads[k] = float(np.max(np.abs(
                g_state[ours_key].astype(np.float64) - g)))
    jax.config.update("jax_enable_x64", False)
    return {
        "loss_delta": abs(float(loss_j) - float(loss_t.item())),
        "max_forward_delta": d_out,
        "max_grad_delta": max(d_grads.values()),
        "grad_deltas_top": dict(sorted(d_grads.items(),
                                       key=lambda kv: -kv[1])[:4]),
    }


def _mlp_transplant_one_split(data, n_train, n_val, epochs, lr, seed,
                              hidden, probe=True):
    """One fold of the transplant: reference trains first (exporting its
    init), ours trains from the transplanted init; both see rows
    [:n_train] as train and [n_train:n_train+n_val] as val."""
    import numpy as np

    init_state, ref_tr, ref_val, ref_dec, ref_best, ref_mae = \
        run_mlp_reference_transplant(data, epochs, lr, n_train, n_val,
                                     seed=seed, hidden=hidden)
    probe_r = (run_mlp_first_step_probe(data, init_state, n_train,
                                        seed=seed, hidden=hidden)
               if probe else None)
    our_tr, our_val, our_dec, our_best, our_mae = run_mlp_ours_transplant(
        data, init_state, epochs, lr, n_train, n_val, seed=seed,
        hidden=hidden)

    n_ep = min(len(ref_tr), len(our_tr))
    d_tr = np.abs(np.asarray(ref_tr[:n_ep]) - np.asarray(our_tr[:n_ep]))
    d_val = np.abs(np.asarray(ref_val[:n_ep]) - np.asarray(our_val[:n_ep]))
    rep = {
        "epochs_ref": len(ref_tr), "epochs_ours": len(our_tr),
        "first_epoch_loss_ref": float(ref_tr[0]),
        "first_epoch_loss_ours": float(our_tr[0]),
        "first_epoch_loss_delta": abs(ref_tr[0] - our_tr[0]),
        "train_loss_delta_max": float(d_tr.max()),
        "val_loss_delta_max": float(d_val.max()),
        "decay_epochs_ref": ref_dec, "decay_epochs_ours": our_dec,
        "best_epoch_ref": ref_best, "best_epoch_ours": our_best,
        "final_val_mae_ref": ref_mae, "final_val_mae_ours": our_mae,
        "final_val_mae_delta": abs(ref_mae - our_mae),
    }
    if probe_r is not None:
        rep.update({
            "f64_first_step_loss_delta": probe_r["loss_delta"],
            "f64_max_forward_delta": probe_r["max_forward_delta"],
            "f64_max_grad_delta": probe_r["max_grad_delta"],
        })
    return rep


def run_mlp_transplant(args):
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import json

    import numpy as np

    from fcsr_tpu.data import load_or_synthesize

    n = args.n
    data = load_or_synthesize(None, n_train=n, n_test=1, seed=42)
    data = {k: np.asarray(v, dtype=np.float32) for k, v in data.items()}

    lr = args.lr if args.lr != 1e-3 else 0.01   # train_model default
    n_in = data["lr_train"].shape[-1]
    n_out = data["hr_train"].shape[-1]
    hidden = args.hidden or _mlp_notebook_hidden(n_in, n_out)

    report = {
        "family": "mlp",
        "mode": "f32 trajectories + f64 first-step probe",
        "hidden": hidden, "n": n, "epochs": args.epochs, "lr": lr,
    }
    if args.splits:
        # the notebook's full shipped schedule: GraphDataModule(k_folds=3,
        # p_val=0.33) = contiguous validation windows of ONE permutation
        # (ref: utils/data.py:126-146; training_template.ipynb cell
        # e34fa3e9); a fresh torch init per fold (cell 60478db constructs
        # a new model each fold).
        from fcsr_tpu.data.datamodule import contiguous_window_folds
        folds = contiguous_window_folds(n, args.splits, 0.33, seed=42)
        report["mode"] += (f" (full schedule: {args.splits} contiguous "
                           f"folds, p_val=0.33)")
        report["folds"] = []
        for k, (tr_idx, va_idx) in enumerate(folds):
            order = np.concatenate([tr_idx, va_idx])
            fold_data = {key: v[order] if key in ("lr_train", "hr_train")
                         else v for key, v in data.items()}
            rep = _mlp_transplant_one_split(
                fold_data, len(tr_idx), len(va_idx), args.epochs, lr,
                seed=k, hidden=hidden, probe=(k == 0))
            rep["fold"] = k
            report["folds"].append(rep)
            print(f"--- fold {k} ---")
            for key, v in rep.items():
                print(f"{key}: {v}")
        report["final_val_mae_ref_mean"] = float(np.mean(
            [f["final_val_mae_ref"] for f in report["folds"]]))
        report["final_val_mae_ours_mean"] = float(np.mean(
            [f["final_val_mae_ours"] for f in report["folds"]]))
        report["final_val_mae_delta_max"] = float(max(
            f["final_val_mae_delta"] for f in report["folds"]))
        out = os.path.join("outputs", "parity",
                           "mlp_transplant_full_schedule.json")
    else:
        n_train = n - int(0.33 * n)   # contiguous_window_folds p_val=0.33
        n_val = n - n_train
        report.update(_mlp_transplant_one_split(
            data, n_train, n_val, args.epochs, lr, seed=0, hidden=hidden))
        out = os.path.join("outputs", "parity", "mlp_transplant.json")

    for k, v in report.items():
        if k != "folds":
            print(f"{k}: {v}")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwritten: {out}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lmbda", type=float, default=16.0)
    ap.add_argument("--transplant", action="store_true",
                    help="weight-transplant trajectory comparison")
    ap.add_argument("--f64", action="store_true",
                    help="run both sides in float64 (semantic-parity proof)")
    ap.add_argument("--tpu", action="store_true",
                    help="(transplant) run our side on the default "
                         "accelerator instead of forcing CPU")
    ap.add_argument("--ref-self-check", action="store_true",
                    help="torch-f32 vs torch-f64 chaos control (no JAX)")
    ap.add_argument("--splits", type=int, default=0,
                    help="(transplant) run the reference's FULL k-fold "
                         "schedule (gsr/gat: sklearn KFold(shuffle, 42); "
                         "mlp: contiguous windows, p_val=0.33) instead "
                         "of the single contiguous split")
    ap.add_argument("--hidden", type=int, default=0,
                    help="(mlp) hidden width override; default = the "
                         "notebook's shipped (n_in+n_out)//2 = 214")
    ap.add_argument("--family", default="gsr",
                    choices=["gsr", "gat", "mlp"],
                    help="model family to compare (gat/mlp: transplant only)")
    args = ap.parse_args()

    if not os.path.isdir(REFERENCE):
        print("(reference checkout not present; nothing to compare)")
        return

    if args.family == "gat":
        run_gat_transplant(args)
        return
    if args.family == "mlp":
        run_mlp_transplant(args)
        return
    if args.ref_self_check:
        run_ref_self_check(args)
        return
    if args.transplant:
        if args.splits:
            import jax
            if not args.tpu:
                jax.config.update("jax_platforms", "cpu")
            run_gsr_transplant_full(args)
        else:
            run_transplant(args)
        return

    from fcsr_tpu.data import load_or_synthesize
    n_train = args.n * 2 // 3
    n_val = args.n - n_train
    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42,
                              flavor="lift")  # recorded runs used v1 data

    mae_o, pcc_o = run_ours(data, args.epochs, args.lr, args.lmbda,
                            n_train, n_val)
    print(f"fcsr_tpu : mae {mae_o:.4f}  pcc {pcc_o:.4f}")
    mae_r, pcc_r = run_reference(data, args.epochs, args.lr,
                                 args.lmbda, n_train, n_val)
    print(f"reference: mae {mae_r:.4f}  pcc {pcc_r:.4f}")
    print(f"delta mae: {abs(mae_o - mae_r):.4f}")


if __name__ == "__main__":
    main()
