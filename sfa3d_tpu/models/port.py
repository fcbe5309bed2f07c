"""PyTorch checkpoint -> flax variables porting.

Lets reference-trained SFA3D checkpoints (`Model_fpn_resnet_18_epoch_*.pth`
state_dicts, utils/train_utils.py:96-104) run in this framework, and powers
the numerical parity tests (our KFPN must reproduce the reference network
within 1e-3, BASELINE.md).

Layout conversions:
- Conv2d weight (O, I, kH, kW)         -> flax kernel (kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW)-> flax kernel (kH, kW, O, I)
  (our DeconvCenterNet uses transpose_kernel=True which matches torch's
  gradient-of-conv convention)
- BatchNorm weight/bias                -> scale/bias params
  running_mean/running_var             -> batch_stats collection
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _deconv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)  # (I,O,kH,kW) -> (kH,kW,O,I)


def _to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _port_convbn(sd, params, stats, torch_conv, torch_bn, flax_path):
    _set(params, flax_path + ("conv", "kernel"), _conv_w(sd[f"{torch_conv}.weight"]))
    if f"{torch_conv}.bias" in sd:
        _set(params, flax_path + ("conv", "bias"), sd[f"{torch_conv}.bias"])
    _set(params, flax_path + ("bn", "scale"), sd[f"{torch_bn}.weight"])
    _set(params, flax_path + ("bn", "bias"), sd[f"{torch_bn}.bias"])
    _set(stats, flax_path + ("bn", "mean"), sd[f"{torch_bn}.running_mean"])
    _set(stats, flax_path + ("bn", "var"), sd[f"{torch_bn}.running_var"])


def _port_backbone(sd, params, stats, num_layers: int, prefix=("backbone",)):
    from sfa3d_tpu.models.resnet import RESNET_SPEC, Bottleneck

    block_cls, counts = RESNET_SPEC[num_layers]
    n_convs = 3 if block_cls is Bottleneck else 2

    _port_convbn(sd, params, stats, "conv1", "bn1", prefix + ("stem",))
    for stage, blocks in enumerate(counts):
        for i in range(blocks):
            t = f"layer{stage + 1}.{i}"
            f = prefix + (f"layer{stage + 1}_{i}",)
            for c in range(1, n_convs + 1):
                _port_convbn(sd, params, stats, f"{t}.conv{c}", f"{t}.bn{c}", f + (f"cb{c}",))
            if f"{t}.downsample.0.weight" in sd:
                _port_convbn(
                    sd, params, stats,
                    f"{t}.downsample.0", f"{t}.downsample.1", f + ("downsample",),
                )


def _deep_merge(dst: dict, src: dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


def port_torchvision_backbone(state_dict: Mapping[str, Any], variables,
                              num_layers: int = 18):
    """Merge a torchvision resnet{18,34,50,...} ImageNet state_dict into the
    BACKBONE subtree of existing model variables, leaving the FPN/deconv and
    head parameters at their init — the analog of the reference's
    `model_zoo.load_url(..., strict=False)` pretrained init
    (/root/reference/models/fpn_resnet.py:265-286). torchvision resnet keys
    (conv1/bn1/layerX.Y.convZ/downsample) are the exact layout the reference
    backbone uses, so `_port_backbone` consumes them directly; fc.* is
    ignored like strict=False ignores it."""
    sd = _to_numpy(state_dict)
    params: dict = {}
    stats: dict = {}
    _port_backbone(sd, params, stats, num_layers)

    new_vars = {
        "params": _tree_to_plain(variables["params"]),
        "batch_stats": _tree_to_plain(variables.get("batch_stats", {})),
    }
    # shape guard: a resnet50 checkpoint fed to an 18-layer model should fail
    # loudly, not silently broadcast
    old_bb = new_vars["params"].get("backbone", {})
    def check(new, old, path=("backbone",)):
        for k, v in new.items():
            if isinstance(v, dict):
                check(v, old.get(k, {}), path + (k,))
            else:
                have = old.get(k)
                if have is None or np.shape(have) != np.shape(v):
                    raise ValueError(
                        f"ImageNet weight {'/'.join(path + (k,))} has shape "
                        f"{np.shape(v)}, model expects "
                        f"{None if have is None else np.shape(have)} — wrong "
                        f"num_layers for this checkpoint?"
                    )
    check(params["backbone"], old_bb)
    _deep_merge(new_vars["params"], params)
    _deep_merge(new_vars["batch_stats"], stats)
    return new_vars


def _tree_to_plain(tree) -> dict:
    """Nested mapping -> plain nested dict of leaves (unfreezes FrozenDict)."""
    if isinstance(tree, Mapping):
        return {k: _tree_to_plain(v) for k, v in tree.items()}
    return tree


def load_imagenet_backbone(variables, num_layers: int = 18,
                           weights_path: str | None = None):
    """Honor `--imagenet_pretrained`: load torchvision ImageNet resnet
    weights into the backbone. With no explicit path, searches the torch hub
    checkpoint cache (this environment has no network egress, so the .pth
    must already be present locally)."""
    import torch

    if weights_path is None:
        hub_dir = os.path.join(
            os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch")),
            "hub", "checkpoints",
        )
        import glob

        candidates = sorted(glob.glob(os.path.join(hub_dir, f"resnet{num_layers}-*.pth")))
        if not candidates:
            raise FileNotFoundError(
                f"no ImageNet resnet{num_layers} checkpoint found in {hub_dir} "
                "and this environment has no network egress; pass "
                "--imagenet_weights /path/to/resnet{N}-*.pth (torchvision "
                "format, e.g. download.pytorch.org/models/resnet18-f37072fd.pth)"
            )
        weights_path = candidates[-1]
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    return port_torchvision_backbone(sd, variables, num_layers)


def port_kfpn_state_dict(state_dict: Mapping[str, Any], num_layers: int = 18):
    """Reference PoseResNet KFPN state_dict -> flax variables dict
    {'params': ..., 'batch_stats': ...} for sfa3d_tpu.models.kfpn.KFPN."""
    from sfa3d_tpu.models.kfpn import HEADS

    sd = _to_numpy(state_dict)
    params: dict = {}
    stats: dict = {}
    _port_backbone(sd, params, stats, num_layers)

    for lvl in (1, 2, 3):
        _set(params, (f"conv_up_level{lvl}", "kernel"), _conv_w(sd[f"conv_up_level{lvl}.weight"]))
        _set(params, (f"conv_up_level{lvl}", "bias"), sd[f"conv_up_level{lvl}.bias"])

    for idx in range(3):
        for head in HEADS:
            t = f"fpn{idx}_{head}"
            _set(params, (t, "conv1", "kernel"), _conv_w(sd[f"{t}.0.weight"]))
            _set(params, (t, "conv1", "bias"), sd[f"{t}.0.bias"])
            _set(params, (t, "conv2", "kernel"), _conv_w(sd[f"{t}.2.weight"]))
            _set(params, (t, "conv2", "bias"), sd[f"{t}.2.bias"])

    return {"params": params, "batch_stats": stats}


def port_deconv_state_dict(state_dict: Mapping[str, Any], num_layers: int = 18):
    """Reference deconv PoseResNet (models/resnet.py) -> flax variables for
    sfa3d_tpu.models.centernet_deconv.DeconvCenterNet."""
    from sfa3d_tpu.models.kfpn import HEADS

    sd = _to_numpy(state_dict)
    params: dict = {}
    stats: dict = {}
    _port_backbone(sd, params, stats, num_layers)

    for i in range(3):
        t_conv = f"deconv_layers.{3 * i}"
        t_bn = f"deconv_layers.{3 * i + 1}"
        _set(params, (f"deconv{i}", "kernel"), _deconv_w(sd[f"{t_conv}.weight"]))
        _set(params, (f"deconv_bn{i}", "scale"), sd[f"{t_bn}.weight"])
        _set(params, (f"deconv_bn{i}", "bias"), sd[f"{t_bn}.bias"])
        _set(stats, (f"deconv_bn{i}", "mean"), sd[f"{t_bn}.running_mean"])
        _set(stats, (f"deconv_bn{i}", "var"), sd[f"{t_bn}.running_var"])

    for head in HEADS:
        f = (f"head_{head}",)
        _set(params, f + ("conv1", "kernel"), _conv_w(sd[f"{head}.0.weight"]))
        _set(params, f + ("conv1", "bias"), sd[f"{head}.0.bias"])
        _set(params, f + ("conv2", "kernel"), _conv_w(sd[f"{head}.2.weight"]))
        _set(params, f + ("conv2", "bias"), sd[f"{head}.2.bias"])

    return {"params": params, "batch_stats": stats}


def export_kfpn_state_dict(variables, num_layers: int = 18) -> Dict[str, "np.ndarray"]:
    """Inverse of port_kfpn_state_dict: flax KFPN variables -> a reference
    PoseResNet state_dict (numpy values; wrap with torch.tensor to load into
    the torch model). Gives reference users a migration path back."""
    from sfa3d_tpu.models.kfpn import HEADS
    from sfa3d_tpu.models.resnet import RESNET_SPEC, Bottleneck

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def put_convbn(flax_node, stats_node, torch_conv, torch_bn):
        sd[f"{torch_conv}.weight"] = np.asarray(flax_node["conv"]["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in flax_node["conv"]:
            sd[f"{torch_conv}.bias"] = np.asarray(flax_node["conv"]["bias"])
        sd[f"{torch_bn}.weight"] = np.asarray(flax_node["bn"]["scale"])
        sd[f"{torch_bn}.bias"] = np.asarray(flax_node["bn"]["bias"])
        sd[f"{torch_bn}.running_mean"] = np.asarray(stats_node["bn"]["mean"])
        sd[f"{torch_bn}.running_var"] = np.asarray(stats_node["bn"]["var"])
        sd[f"{torch_bn}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    bb_p, bb_s = params["backbone"], stats["backbone"]
    put_convbn(bb_p["stem"], bb_s["stem"], "conv1", "bn1")
    block_cls, counts = RESNET_SPEC[num_layers]
    n_convs = 3 if block_cls is Bottleneck else 2
    for stage, blocks in enumerate(counts):
        for i in range(blocks):
            f = f"layer{stage + 1}_{i}"
            t = f"layer{stage + 1}.{i}"
            for c in range(1, n_convs + 1):
                put_convbn(bb_p[f][f"cb{c}"], bb_s[f][f"cb{c}"], f"{t}.conv{c}", f"{t}.bn{c}")
            if "downsample" in bb_p[f]:
                put_convbn(bb_p[f]["downsample"], bb_s[f]["downsample"],
                           f"{t}.downsample.0", f"{t}.downsample.1")

    for lvl in (1, 2, 3):
        node = params[f"conv_up_level{lvl}"]
        sd[f"conv_up_level{lvl}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        sd[f"conv_up_level{lvl}.bias"] = np.asarray(node["bias"])

    for idx in range(3):
        for head in HEADS:
            t = f"fpn{idx}_{head}"
            node = params[t]
            sd[f"{t}.0.weight"] = np.asarray(node["conv1"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{t}.0.bias"] = np.asarray(node["conv1"]["bias"])
            sd[f"{t}.2.weight"] = np.asarray(node["conv2"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{t}.2.bias"] = np.asarray(node["conv2"]["bias"])
    return sd


def save_torch_checkpoint(path: str, variables, num_layers: int = 18):
    """Write a reference-loadable Model_*.pth from flax variables."""
    import torch

    sd = {k: torch.tensor(v) for k, v in export_kfpn_state_dict(variables, num_layers).items()}
    torch.save(sd, path)
    return path


def load_torch_checkpoint(path: str, num_layers: int = 18, arch: str = "fpn_resnet"):
    """Load a reference .pth checkpoint file into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    if arch.startswith("fpn_resnet"):
        return port_kfpn_state_dict(sd, num_layers)
    return port_deconv_state_dict(sd, num_layers)
