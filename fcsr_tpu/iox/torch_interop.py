"""Weight transplant between this framework's GSR-Net and the reference's
PyTorch ``GSRNet`` state_dict layout.

The reference model (ref: models/gsr_model.py:10-21, models/layers.py:18,
models/ops.py:63-82) names its parameters::

    layer.weights                      (hr, lr)
    net.start_gcn.proj.{weight,bias}   Linear: weight is (out, in)
    net.bottom_gcn.proj.{weight,bias}
    net.end_gcn.proj.{weight,bias}
    net.down_gcns.{i}.proj.{weight,bias}
    net.up_gcns.{i}.proj.{weight,bias}
    net.pools.{i}.proj.{weight,bias}
    gc1.weight                         (in, out)  -- NOT a Linear; no bias
    gc2.weight                         (in, out)

Our flax tree stores Dense kernels as (in, out), so Linear weights
transpose on the way through; ``layer.weights`` and the raw
GraphConvolution ``gc{1,2}.weight`` matrices carry over unchanged.

These converters are pure numpy (no torch import): the torch boundary is
``{k: torch.from_numpy(v) for ...}`` / ``{k: v.detach().numpy() for ...}``
on the caller's side, which keeps this module importable in torch-free
deployments.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["flax_to_reference_state", "reference_state_to_flax",
           "N_UNET_LEVELS"]

N_UNET_LEVELS = 4  # len(ks) in the shipped config (training_gsr.ipynb)


def _n_levels(net_params: Mapping) -> int:
    return sum(1 for k in net_params if k.startswith("down_gcns_"))


def flax_to_reference_state(params) -> Dict[str, np.ndarray]:
    """Flax GSR-Net param tree -> reference torch ``state_dict`` mapping
    (plain numpy arrays keyed by the reference's parameter names)."""
    p = params["params"]
    net = p["net"]
    out: Dict[str, np.ndarray] = {
        "layer.weights": np.asarray(p["layer"]["weights"]),
        "gc1.weight": np.asarray(p["gc1"]["weight"]),
        "gc2.weight": np.asarray(p["gc2"]["weight"]),
    }

    def put_linear(torch_prefix: str, dense: Mapping):
        out[f"{torch_prefix}.weight"] = np.asarray(dense["kernel"]).T
        out[f"{torch_prefix}.bias"] = np.asarray(dense["bias"])

    for name in ("start_gcn", "bottom_gcn", "end_gcn"):
        put_linear(f"net.{name}.proj", net[name]["proj"])
    for i in range(_n_levels(net)):
        put_linear(f"net.down_gcns.{i}.proj", net[f"down_gcns_{i}"]["proj"])
        put_linear(f"net.up_gcns.{i}.proj", net[f"up_gcns_{i}"]["proj"])
        put_linear(f"net.pools.{i}.proj", net[f"pools_{i}"]["proj"])
    return out


def reference_state_to_flax(state: Mapping[str, np.ndarray],
                            dtype=np.float32):
    """Reference torch ``state_dict`` (numpy-valued) -> flax param tree.

    The level count is inferred from the state keys; the resulting tree
    matches ``GSRNet(...).init(...)`` exactly (verified round-trip in
    tests/test_torch_interop.py).
    """
    def arr(key):
        return np.asarray(state[key], dtype=dtype)

    def get_linear(torch_prefix: str):
        return {"kernel": arr(f"{torch_prefix}.weight").T,
                "bias": arr(f"{torch_prefix}.bias")}

    n_levels = sum(1 for k in state
                   if k.startswith("net.down_gcns.") and k.endswith(".bias"))
    net = {name: {"proj": get_linear(f"net.{name}.proj")}
           for name in ("start_gcn", "bottom_gcn", "end_gcn")}
    for i in range(n_levels):
        net[f"down_gcns_{i}"] = {"proj": get_linear(f"net.down_gcns.{i}.proj")}
        net[f"up_gcns_{i}"] = {"proj": get_linear(f"net.up_gcns.{i}.proj")}
        net[f"pools_{i}"] = {"proj": get_linear(f"net.pools.{i}.proj")}
    return {"params": {
        "layer": {"weights": arr("layer.weights")},
        "net": net,
        "gc1": {"weight": arr("gc1.weight")},
        "gc2": {"weight": arr("gc2.weight")},
    }}
