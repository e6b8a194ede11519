"""A/B the fused GAT kernel's softmax chains: per-head vs batched.

VERDICT r3 item 7: batch the per-head exp/mask/softmax elementwise
chains into one (n, heads*n) chain (fused_gat._gat_layer_batched) and
measure. Times the full fused training-step kernel (fwd + in-kernel AD
+ AdamW) at the production GAT config, hoist-proof scan harness like
kernel_times.py.

Run on the real TPU: python tools/experiments/gat_chain_batch.py [T]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fcsr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.core.normalize import symmetric_normalize
from fcsr_tpu.models.fused_gat import (gat_leaves_from_tree,
                                       gat_train_step_fused)
from fcsr_tpu.train.gat_loop import GATTrainConfig, precompute_gat_features

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
cfg = GATTrainConfig()  # production: n=160, m=268, dim=16, ks=.5^3, heads=4
DROP = float(os.environ.get("DROP", cfg.drop_p))

rng = np.random.default_rng(0)
a_raw = rng.random((cfg.n_nodes, cfg.n_nodes)).astype(np.float32)
a_raw = np.where((a_raw + a_raw.T) / 2 > 0.3, (a_raw + a_raw.T) / 2,
                 0.0).astype(np.float32)
hr = rng.random((cfg.m_nodes, cfg.m_nodes)).astype(np.float32)
hr = jnp.asarray((hr + hr.T) / 2)
model = cfg.model()
v = model.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, jnp.asarray(a_raw))
x0 = jnp.asarray(precompute_gat_features(a_raw[None], dim=cfg.dim)[0])
a0 = symmetric_normalize(jnp.asarray(a_raw) + jnp.eye(cfg.n_nodes))
leaves = gat_leaves_from_tree(v["params"], cfg.dim, cfg.ks, cfg.heads)
interp = jax.default_backend() != "tpu"
print(f"device={jax.devices()[0]}  T={T}  drop_p={DROP}", flush=True)


def run(name, batched):
    kw = dict(dim=cfg.dim, ks=cfg.ks, n_nodes=cfg.n_nodes,
              m_nodes=cfg.m_nodes, heads=cfg.heads, drop_p=DROP,
              interpret=interp, batched_chain=batched)

    def prog(p_l):
        m0 = [jnp.zeros_like(l) for l in p_l]
        scal = jnp.asarray([[1.0, 1e-3, 0.1, 0.001]], jnp.float32)

        def step(carry, i):
            p_l, m_l, v_l = carry
            seeds = jnp.stack([i, i + 1]).astype(jnp.int32).reshape(1, 2)
            p_l = [p * (1.0 + 1e-12 * i) for p in p_l]  # hoist-proof
            loss, p_l, m_l, v_l = gat_train_step_fused(
                p_l, m_l, v_l, a0, x0, hr, scal, seeds, **kw)
            return (p_l, m_l, v_l), loss

        (_, _, _), losses = jax.lax.scan(
            step, (p_l, m0, [jnp.zeros_like(l) for l in p_l]),
            jnp.arange(T))
        return losses[-1], losses[0]

    f = jax.jit(prog)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(leaves))
    t1 = time.perf_counter()
    out = jax.block_until_ready(f(leaves))
    t2 = time.perf_counter()
    print(f"{name:10s}: {(t2 - t1) / T * 1e6:8.1f} us/step "
          f"(steady {t2 - t1:.3f}s, cold {t1 - t0:.1f}s, "
          f"loss0={float(out[1]):.6f})", flush=True)


run("per-head", False)
run("batched", True)
