#!/usr/bin/env python
"""Cross-implementation parity harness: train the ACTUAL reference
PyTorch GSR-Net (mounted read-only at /root/reference — its GSR path has
no PyG dependency) and our JAX implementation on IDENTICAL synthetic data
and hyperparameters, and compare validation MAE/PCC.

Measured (40 train / 20 val subjects, 30 epochs, lr 1e-3, lmbda 16):

    reference (torch CPU): mae 0.0726  pcc 0.0014
    fcsr_tpu   (JAX):      mae 0.0669  pcc -0.0014

i.e. equivalent behavior (different random init); the near-zero PCC is a
property of the synthetic data (GSR-Net's subject-dependence flows solely
through the LR eigenbasis — the reference's published PCC 0.58 comes from
real SLIM connectomes, which are private), NOT an implementation gap: the
reference itself scores the same here.

Usage: python tools/parity_vs_reference.py [--epochs 30] [--n 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = "/root/reference"


def run_reference(data, epochs, lr, lmbda, n_train, n_val):
    import numpy as np
    import torch
    from scipy.stats import pearsonr

    sys.path.insert(0, REFERENCE)
    from models.gsr_model import GSRNet  # noqa: E402
    from utils.preprocessing import pad_HR_adj, unpad  # noqa: E402

    class Args:
        pass

    args = Args()
    args.lr_dim, args.hr_dim, args.hidden_dim, args.padding = 160, 268, 268, 0

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lmbda", type=float, default=16.0)
    args = ap.parse_args()

    from fcsr_tpu.data import load_or_synthesize
    n_train = args.n * 2 // 3
    n_val = args.n - n_train
    data = load_or_synthesize(None, n_train=args.n, n_test=1, seed=42)

    mae_o, pcc_o = run_ours(data, args.epochs, args.lr, args.lmbda,
                            n_train, n_val)
    print(f"fcsr_tpu : mae {mae_o:.4f}  pcc {pcc_o:.4f}")

    if os.path.isdir(REFERENCE):
        mae_r, pcc_r = run_reference(data, args.epochs, args.lr,
                                     args.lmbda, n_train, n_val)
        print(f"reference: mae {mae_r:.4f}  pcc {pcc_r:.4f}")
        print(f"delta mae: {abs(mae_o - mae_r):.4f}")
    else:
        print("(reference checkout not present; skipping torch run)")


if __name__ == "__main__":
    main()
