"""Torch checkpoint <-> flax parameter conversion.

The reference ships ``.pth`` state_dicts (``point_encoder_epochbest.pth`` /
``ppf_encoder_epochbest.pth``, reference nocs/inference.py:87-88).  This
module maps them onto our flax module trees so reference checkpoints can be
run for parity evals, and our checkpoints exported back.

Key mapping (torch → flax):
    Linear.weight [out,in] → Dense.kernel [in,out] (transposed); bias as-is
    LayerNorm.weight/bias  → LayerNorm.scale/bias
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _layernorm(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _conv_kernel_mlp(sd, prefix: str, n_hidden: int) -> dict:
    """torch conv_kernel Sequential: [Linear, LN, ReLU]*n_hidden + Linear.

    Sequential indices: Linear at 3i, LayerNorm at 3i+1, final Linear at
    3*n_hidden.
    """
    out = {}
    for i in range(n_hidden):
        out[f"lin{i}"] = _dense(sd, f"{prefix}.{3 * i}")
        out[f"ln{i}"] = _layernorm(sd, f"{prefix}.{3 * i + 1}")
    out["lin_out"] = _dense(sd, f"{prefix}.{3 * n_hidden}")
    return out


def point_encoder_from_torch(sd: Dict[str, np.ndarray], num_layers: int = 1, n_spfcs: int = 4) -> dict:
    """Map a reference PointEncoder state_dict to our flax params tree."""
    params = {}
    for i in range(num_layers):
        params[f"spconv{i}"] = {
            "kernel": _conv_kernel_mlp(sd, f"spconvs.{i}.kernel", n_spfcs),
            "outnet": _dense(sd, f"spconvs.{i}.outnet"),
            "norm": _layernorm(sd, f"spconvs.{i}.layer_norm"),
        }
        params[f"aggr{i}"] = {"linear": _dense(sd, f"aggrs.{i}.linear")}
    return {"params": params}


def ppf_encoder_from_torch(sd: Dict[str, np.ndarray], n_res: int = 3) -> dict:
    """Map a reference PPFEncoder state_dict to our flax params tree."""
    params = {}
    for i in range(n_res):
        layer = {
            "fc1": _dense(sd, f"res_layers.{i}.fc1"),
            "fc2": _dense(sd, f"res_layers.{i}.fc2"),
        }
        if f"res_layers.{i}.fc0.weight" in sd:
            layer["fc0"] = _dense(sd, f"res_layers.{i}.fc0")
        params[f"res{i}"] = layer
    params["final"] = _dense(sd, "final")
    return {"params": params}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in sd.items()}


def point_encoder_to_torch(params: dict, num_layers: int = 1, n_spfcs: int = 4) -> dict:
    """Inverse mapping (flax → torch state_dict with numpy values)."""
    p = params["params"]
    sd = {}
    for i in range(num_layers):
        ck = p[f"spconv{i}"]["kernel"]
        for j in range(n_spfcs):
            sd[f"spconvs.{i}.kernel.{3*j}.weight"] = np.asarray(ck[f"lin{j}"]["kernel"]).T
            sd[f"spconvs.{i}.kernel.{3*j}.bias"] = np.asarray(ck[f"lin{j}"]["bias"])
            sd[f"spconvs.{i}.kernel.{3*j+1}.weight"] = np.asarray(ck[f"ln{j}"]["scale"])
            sd[f"spconvs.{i}.kernel.{3*j+1}.bias"] = np.asarray(ck[f"ln{j}"]["bias"])
        sd[f"spconvs.{i}.kernel.{3*n_spfcs}.weight"] = np.asarray(ck["lin_out"]["kernel"]).T
        sd[f"spconvs.{i}.kernel.{3*n_spfcs}.bias"] = np.asarray(ck["lin_out"]["bias"])
        sd[f"spconvs.{i}.outnet.weight"] = np.asarray(p[f"spconv{i}"]["outnet"]["kernel"]).T
        sd[f"spconvs.{i}.outnet.bias"] = np.asarray(p[f"spconv{i}"]["outnet"]["bias"])
        sd[f"spconvs.{i}.layer_norm.weight"] = np.asarray(p[f"spconv{i}"]["norm"]["scale"])
        sd[f"spconvs.{i}.layer_norm.bias"] = np.asarray(p[f"spconv{i}"]["norm"]["bias"])
        sd[f"aggrs.{i}.linear.weight"] = np.asarray(p[f"aggr{i}"]["linear"]["kernel"]).T
        sd[f"aggrs.{i}.linear.bias"] = np.asarray(p[f"aggr{i}"]["linear"]["bias"])
    return sd


def ppf_encoder_to_torch(params: dict, n_res: int = 3) -> dict:
    """Inverse mapping for the PPF head (flax → torch state_dict)."""
    p = params["params"]
    sd = {}
    for i in range(n_res):
        layer = p[f"res{i}"]
        sd[f"res_layers.{i}.fc1.weight"] = np.asarray(layer["fc1"]["kernel"]).T
        sd[f"res_layers.{i}.fc1.bias"] = np.asarray(layer["fc1"]["bias"])
        sd[f"res_layers.{i}.fc2.weight"] = np.asarray(layer["fc2"]["kernel"]).T
        sd[f"res_layers.{i}.fc2.bias"] = np.asarray(layer["fc2"]["bias"])
        if "fc0" in layer:
            sd[f"res_layers.{i}.fc0.weight"] = np.asarray(layer["fc0"]["kernel"]).T
            sd[f"res_layers.{i}.fc0.bias"] = np.asarray(layer["fc0"]["bias"])
    sd["final.weight"] = np.asarray(p["final"]["kernel"]).T
    sd["final.bias"] = np.asarray(p["final"]["bias"])
    return sd


def export_reference_pth(params: dict, point_path: str, ppf_path: str) -> None:
    """Save our params as reference-format .pth files (torch required)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in point_encoder_to_torch(params["point"]).items()}, point_path)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in ppf_encoder_to_torch(params["ppf"]).items()}, ppf_path)


def _in_params(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """InstanceNorm params from a converted-BN torch layer.

    The reference's convert_layers keeps track_running_stats=True
    (utils/util.py:49-50), so the state dict carries running_mean/var which
    eval-mode normalisation uses (nocs/inference.py:94-95)."""
    out = {"scale": np.asarray(sd[prefix + ".weight"]),
           "bias": np.asarray(sd[prefix + ".bias"])}
    if prefix + ".running_mean" in sd:
        out["mean"] = np.asarray(sd[prefix + ".running_mean"])
        out["var"] = np.asarray(sd[prefix + ".running_var"])
    return out


def _conv2d(sd: Dict[str, np.ndarray], prefix: str, bias: bool = False) -> dict:
    # torch OIHW -> flax HWIO
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def fcn_resnet50_from_torch(sd: Dict[str, np.ndarray],
                            layers=(3, 4, 6, 3)) -> dict:
    """torchvision fcn_resnet50 (BN→IN converted, reference
    train_laptop_aux.py:26-27) state dict → our FCNResNet50 params."""
    p = {
        "stem_conv": _conv2d(sd, "backbone.conv1"),
        "stem_bn": _in_params(sd, "backbone.bn1"),
        "head_conv": _conv2d(sd, "classifier.0"),
        "head_bn": _in_params(sd, "classifier.1"),
        "head_out": _conv2d(sd, "classifier.4", bias=True),
    }
    for li, blocks in enumerate(layers):
        for b in range(blocks):
            t = f"backbone.layer{li + 1}.{b}"
            blk = {
                "conv1": _conv2d(sd, t + ".conv1"),
                "bn1": _in_params(sd, t + ".bn1"),
                "conv2": _conv2d(sd, t + ".conv2"),
                "bn2": _in_params(sd, t + ".bn2"),
                "conv3": _conv2d(sd, t + ".conv3"),
                "bn3": _in_params(sd, t + ".bn3"),
            }
            if t + ".downsample.0.weight" in sd:
                blk["down_conv"] = _conv2d(sd, t + ".downsample.0")
                blk["down_bn"] = _in_params(sd, t + ".downsample.1")
            p[f"layer{li + 1}_{b}"] = blk
    return {"params": p}
