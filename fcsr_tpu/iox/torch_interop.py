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
           "gat_reference_state_to_flax", "flax_to_gat_reference_state",
           "mlp_reference_state_to_flax", "flax_to_mlp_reference_state",
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


# ---------------------------------------------------------------------------
# GAT Graph-U-Net family (ref: unet-transformer.py:264-428)
# ---------------------------------------------------------------------------
# Reference torch names (with PyG-GATConv submodule ``gat``):
#   {down_gcns,up_gcns}.{i}.gat.lin.weight   (heads*d_head, in)  bias-free
#   ....gat.att_src / att_dst                (1, heads, d_head)
#   ....gat.bias                             (heads*d_head,)
#   bottom_gcn.gat.*                         (heads=2)
#   pools.{i}.proj.{weight,bias}             Linear(in, 1)
#   upsampler.upsample_mlp.{weight,bias}     Linear(n_nodes, m_nodes)
# NOTE the reference reverses its up_gcns ModuleList after construction
# (ref: unet-transformer.py:293), so torch ``up_gcns.{i}`` and our flax
# ``up_gcns_{i}`` already agree in execution order — no index remap.
# Our DenseGAT stores w (in, heads*d_head), att_src/att_dst (heads,
# d_head), bias (heads*d_head,) — models/gat_unet.py::DenseGAT.


def _gat_layer_names(state: Mapping) -> list:
    n_levels = sum(1 for k in state
                   if k.startswith("down_gcns.") and k.endswith(".gat.bias"))
    names = []
    for i in range(n_levels):
        names.append((f"down_gcns.{i}.gat", f"down_gcns_{i}"))
        names.append((f"up_gcns.{i}.gat", f"up_gcns_{i}"))
    names.append(("bottom_gcn.gat", "bottom_gcn"))
    return names


def gat_reference_state_to_flax(state: Mapping[str, np.ndarray],
                                dtype=np.float32):
    """Reference GraphUnet ``state_dict`` (numpy-valued) -> our
    GATGraphUnet flax param tree."""
    def arr(key):
        return np.asarray(state[key], dtype=dtype)

    tree = {}
    for tname, fname in _gat_layer_names(state):
        tree[fname] = {
            "w": arr(f"{tname}.lin.weight").T,
            "att_src": arr(f"{tname}.att_src")[0],
            "att_dst": arr(f"{tname}.att_dst")[0],
            "bias": arr(f"{tname}.bias"),
        }
    n_levels = sum(1 for k in state
                   if k.startswith("pools.") and k.endswith(".proj.bias"))
    for i in range(n_levels):
        tree[f"pools_{i}"] = {"proj": {
            "kernel": arr(f"pools.{i}.proj.weight").T,
            "bias": arr(f"pools.{i}.proj.bias")}}
    tree["upsampler"] = {"upsample_mlp": {
        "kernel": arr("upsampler.upsample_mlp.weight").T,
        "bias": arr("upsampler.upsample_mlp.bias")}}
    return {"params": tree}


def flax_to_gat_reference_state(params) -> Dict[str, np.ndarray]:
    """Inverse of gat_reference_state_to_flax (round-trip tested)."""
    p = params["params"]
    out: Dict[str, np.ndarray] = {}
    n_levels = sum(1 for k in p if k.startswith("down_gcns_"))
    pairs = [(f"down_gcns_{i}", f"down_gcns.{i}.gat")
             for i in range(n_levels)]
    pairs += [(f"up_gcns_{i}", f"up_gcns.{i}.gat") for i in range(n_levels)]
    pairs.append(("bottom_gcn", "bottom_gcn.gat"))
    for fname, tname in pairs:
        lv = p[fname]
        out[f"{tname}.lin.weight"] = np.asarray(lv["w"]).T
        out[f"{tname}.att_src"] = np.asarray(lv["att_src"])[None]
        out[f"{tname}.att_dst"] = np.asarray(lv["att_dst"])[None]
        out[f"{tname}.bias"] = np.asarray(lv["bias"])
    for i in range(n_levels):
        proj = p[f"pools_{i}"]["proj"]
        out[f"pools.{i}.proj.weight"] = np.asarray(proj["kernel"]).T
        out[f"pools.{i}.proj.bias"] = np.asarray(proj["bias"])
    up = p["upsampler"]["upsample_mlp"]
    out["upsampler.upsample_mlp.weight"] = np.asarray(up["kernel"]).T
    out["upsampler.upsample_mlp.bias"] = np.asarray(up["bias"])
    return out


# ---------------------------------------------------------------------------
# SpectralResMLP (v2) family (ref: training_template.ipynb cell 334b874b)
# ---------------------------------------------------------------------------
# Reference torch names (legacy ``torch.nn.utils.spectral_norm`` wrapper):
#   input_layer.1.{weight_orig,bias,weight_u,weight_v}   Linear(L_in, h)
#   input_layer.2.{weight,bias,running_mean,running_var} BatchNorm1d(h)
#   residual_blocks.{i}.0.*  /  residual_blocks.{i}.1.*  (n_layers blocks)
#   output_layer.0.{weight_orig,bias,weight_u,weight_v}  Linear(h, L_out)
# torch stores weight_u AND weight_v; our SNDense (models/mlp.py) mirrors
# that exactly (batch_stats: u (out,), v (in,) scoped under the dense's
# own name), including torch's frozen-(u,v) eval-mode sigma.


def _mlp_n_layers(state: Mapping) -> int:
    return len({k.split(".")[1] for k in state
                if k.startswith("residual_blocks.")})


def mlp_reference_state_to_flax(state: Mapping[str, np.ndarray],
                                dtype=np.float32):
    """Notebook SuperResMLP-v2 torch ``state_dict`` (numpy-valued) ->
    our SpectralResMLP variables {'params', 'batch_stats'}."""
    def arr(key):
        return np.asarray(state[key], dtype=dtype)

    def sn_linear(tprefix):
        return {"kernel": arr(f"{tprefix}.weight_orig").T,
                "bias": arr(f"{tprefix}.bias")}

    def bn(tprefix):
        return ({"scale": arr(f"{tprefix}.weight"),
                 "bias": arr(f"{tprefix}.bias")},
                {"mean": arr(f"{tprefix}.running_mean"),
                 "var": arr(f"{tprefix}.running_var")})

    n_layers = _mlp_n_layers(state)
    params = {"input_dense": sn_linear("input_layer.1")}
    stats = {"input_dense": {"u": arr("input_layer.1.weight_u"),
                             "v": arr("input_layer.1.weight_v")}}
    params["input_bn"], stats["input_bn"] = bn("input_layer.2")
    for i in range(n_layers):
        params[f"res_dense_{i}"] = sn_linear(f"residual_blocks.{i}.0")
        stats[f"res_dense_{i}"] = {
            "u": arr(f"residual_blocks.{i}.0.weight_u"),
            "v": arr(f"residual_blocks.{i}.0.weight_v")}
        params[f"res_bn_{i}"], stats[f"res_bn_{i}"] = bn(
            f"residual_blocks.{i}.1")
    params["output_dense"] = sn_linear("output_layer.0")
    stats["output_dense"] = {"u": arr("output_layer.0.weight_u"),
                             "v": arr("output_layer.0.weight_v")}
    return {"params": params, "batch_stats": stats}


def flax_to_mlp_reference_state(variables) -> Dict[str, np.ndarray]:
    """Inverse of mlp_reference_state_to_flax (round-trip tested)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    n_layers = sum(1 for k in p if k.startswith("res_dense_"))

    out: Dict[str, np.ndarray] = {}

    def put_sn_linear(tprefix, dense_name):
        out[f"{tprefix}.weight_orig"] = np.asarray(
            p[dense_name]["kernel"]).T                # torch (out, in)
        out[f"{tprefix}.bias"] = np.asarray(p[dense_name]["bias"])
        out[f"{tprefix}.weight_u"] = np.asarray(bs[dense_name]["u"])
        out[f"{tprefix}.weight_v"] = np.asarray(bs[dense_name]["v"])

    def put_bn(tprefix, bn_name):
        out[f"{tprefix}.weight"] = np.asarray(p[bn_name]["scale"])
        out[f"{tprefix}.bias"] = np.asarray(p[bn_name]["bias"])
        out[f"{tprefix}.running_mean"] = np.asarray(bs[bn_name]["mean"])
        out[f"{tprefix}.running_var"] = np.asarray(bs[bn_name]["var"])
        out[f"{tprefix}.num_batches_tracked"] = np.asarray(0)

    put_sn_linear("input_layer.1", "input_dense")
    put_bn("input_layer.2", "input_bn")
    for i in range(n_layers):
        put_sn_linear(f"residual_blocks.{i}.0", f"res_dense_{i}")
        put_bn(f"residual_blocks.{i}.1", f"res_bn_{i}")
    put_sn_linear("output_layer.0", "output_dense")
    return out
