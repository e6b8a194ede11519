import jax, numpy as np, os
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import fcsr_tpu.data.synthetic as syn
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import GSRFoldRunner, evaluate_gsr_folds

# Phase A: train M0 on v1 lift data (200 ep, reference config)
lr, hr1 = syn.synthesize_paired_connectomes(167, seed=42)
cfg = GSRTrainConfig(epochs=200)
folds = kfold_indices(167, 3, seed=42)
rA = GSRFoldRunner(cfg, lr, hr1, folds)
rA.train()
p0 = rA.params_per_fold()[0]
model = cfg.model()

# teacher outputs of M0 on ALL subjects
us = np.stack([np.linalg.eigh(syn._normalize_adj_np(lr[i].astype(np.float64)))[1]
               for i in range(167)]).astype(np.float32)
def fwd(lrm, u):
    pred, _, _, _ = model.apply(p0, lrm, u_lr=u)
    return pred
t_out = np.asarray(jax.vmap(fwd)(jnp.asarray(lr), jnp.asarray(us)))
print('teacher out mean/std/max:', t_out.mean(), t_out.std(), t_out.max())
rng = np.random.default_rng(123)
hr2 = t_out.copy()
e = rng.normal(0, 0.005, hr2.shape)
hr2 = np.clip(hr2 + (e + e.transpose(0,2,1))/2, 0, 1).astype(np.float32)
for m in hr2: np.fill_diagonal(m, 0)
dev = np.abs(hr2 - hr2.mean(0)[None]).mean()
print('hr2 subject-dev-from-mean MAE:', dev)

# Phase B: fresh student on distilled data
rB = GSRFoldRunner(cfg, lr, hr2, folds, init_seed=7)
rB.train()
maes, outs = evaluate_gsr_folds(cfg, rB)
preds, gts = outs[0]
mean0 = hr2[folds[0][0]].mean(0).copy(); np.fill_diagonal(mean0, 1.0)
base = np.abs(gts - mean0[None]).mean()
sd = np.corrcoef((preds-preds.mean(0)).ravel(), (gts-gts.mean(0)).ravel())[0,1]
print(f"student val={np.mean(maes):.5f} base_f0={base:.5f} subj_dev_corr={sd:.3f} fold_maes={[round(m,5) for m in maes]}")
