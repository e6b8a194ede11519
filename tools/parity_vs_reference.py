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
    args = ap.parse_args()

    if not os.path.isdir(REFERENCE):
        print("(reference checkout not present; nothing to compare)")
        return

    if args.ref_self_check:
        run_ref_self_check(args)
        return
    if args.transplant:
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
