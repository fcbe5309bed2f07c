#!/usr/bin/env python
"""Turnkey numerical verification of the ultralytics YOLOv8 weight import.

    python scripts/verify_yolo_import.py /path/to/yolov8n.pt [--imgsz 640]

The moment a real ultralytics artifact is available, this prints the
per-level max deviation between the torch forward and the JAX model loaded
through `port_ultralytics_state_dict`, and exits non-zero if any level
deviates by more than --tol (default 1e-3, the repo's parity budget).

Ground-truth source, best available first:
  1. `ultralytics` installed + full checkpoint: the checkpoint's own
     DetectionModel runs in eval mode with forward hooks on the Detect
     head's cv2/cv3 towers (raw per-level outputs, pre-decode). This is
     the non-circular check VERDICT r2 asked for.
  2. Plain state_dict (or no ultralytics): the torch mirror from
     tests/test_yolov8_port.py carries the real weights. This validates
     the IMPORTER only (mirror fidelity is separately pinned to the
     published parameter table by tests/test_yolov8_port.py::
     test_mirror_param_counts_match_published_table).

Reference dependency being verified: YOLO('yolov8n.pt')
(/root/reference/test3.py:470-472) — the fusion pipeline's 2D branch.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def load_state_dict(path):
    """-> (state_dict with model.N.* keys, torch DetectionModel or None)."""
    import torch

    module = None
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as e:  # unpickle needs ultralytics classes
        print(f"full load failed ({e}); retrying weights_only", file=sys.stderr)
        ckpt = torch.load(path, map_location="cpu", weights_only=True)

    if isinstance(ckpt, dict) and hasattr(ckpt.get("model"), "state_dict"):
        module = ckpt["model"].float().eval()
        sd = module.state_dict()
    elif isinstance(ckpt, dict):
        sd = ckpt.get("state_dict", ckpt)
    else:  # a bare nn.Module
        module = ckpt.float().eval()
        sd = module.state_dict()

    # YOLO wrapper state_dicts prefix an extra 'model.'
    if any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    assert any(k.startswith("model.0.") for k in sd), (
        "unrecognized checkpoint layout; expected ultralytics model.N.* keys"
    )
    return sd, module


def infer_arch(sd):
    """(scale, num_classes) from landmark shapes."""
    stem_out = sd["model.0.conv.weight"].shape[0]
    scale = {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}[int(stem_out)]
    nc = int(sd["model.22.cv3.0.2.bias"].shape[0])
    return scale, nc


def torch_levels_from_module(module, x_nchw):
    """Run the real DetectionModel, capturing raw per-level (box, cls)
    outputs via hooks on Detect.cv2[i]/cv3[i]."""
    import torch

    det = module.model[-1]
    grabbed = {}

    def hook(name):
        def fn(_m, _inp, out):
            grabbed[name] = out.detach()
        return fn

    handles = [det.cv2[i].register_forward_hook(hook(f"box{i}")) for i in range(3)]
    handles += [det.cv3[i].register_forward_hook(hook(f"cls{i}")) for i in range(3)]
    with torch.no_grad():
        module(torch.from_numpy(x_nchw))
    for h in handles:
        h.remove()
    return [(grabbed[f"box{i}"], grabbed[f"cls{i}"]) for i in range(3)]


def torch_levels_from_mirror(sd, scale, nc, x_nchw):
    import torch

    from tests.test_yolov8_port import TYOLOv8
    from sfa3d_tpu.models.yolov8 import YOLOv8

    jm = YOLOv8(scale=scale, num_classes=nc)
    mirror = TYOLOv8(jm.widths(), jm.depths(), nc=nc)
    missing, unexpected = mirror.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    missing = [k for k in missing if "num_batches" not in k]
    unexpected = [k for k in unexpected if "num_batches" not in k]
    assert not missing, f"mirror missing keys: {missing[:8]}"
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:8]}"
    mirror.eval()
    with torch.no_grad():
        return mirror(torch.from_numpy(x_nchw))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # deterministic, chip-free
    import jax.numpy as jnp

    from sfa3d_tpu.models.yolov8 import YOLOv8, port_ultralytics_state_dict

    sd, module = load_state_dict(args.checkpoint)
    scale, nc = infer_arch(sd)
    # learnable params only (excluding BN running stats/counters) — directly
    # comparable to the published "Model summary" counts (3,157,200 for
    # yolov8n, 11,166,560 for yolov8s at nc=80)
    n_params = int(
        sum(
            np.asarray(v).size
            for k, v in sd.items()
            if "running_" not in k and "num_batches" not in k
        )
    )
    print(f"checkpoint: scale={scale} nc={nc} params={n_params}")

    x = (
        np.random.default_rng(args.seed)
        .uniform(0, 1, (1, args.imgsz, args.imgsz, 3))
        .astype(np.float32)
    )
    x_nchw = np.ascontiguousarray(x.transpose(0, 3, 1, 2))

    if module is not None:
        t_levels = torch_levels_from_module(module, x_nchw)
        source = "ultralytics DetectionModel (non-circular)"
    else:
        t_levels = torch_levels_from_mirror(sd, scale, nc, x_nchw)
        source = "torch mirror (importer-only check)"
    print(f"ground truth: {source}")

    variables = port_ultralytics_state_dict(sd, scale=scale, num_classes=nc)
    jmodel = YOLOv8(scale=scale, num_classes=nc)
    j_levels = jmodel.apply(variables, jnp.asarray(x), train=False)

    worst = 0.0
    for i, ((jb, jc), (tb, tc)) in enumerate(zip(j_levels, t_levels)):
        db = float(
            np.abs(np.asarray(jb) - tb.numpy().transpose(0, 2, 3, 1)).max()
        )
        dc = float(
            np.abs(np.asarray(jc) - tc.numpy().transpose(0, 2, 3, 1)).max()
        )
        stride = 8 * 2**i
        print(f"level P{i + 3} (stride {stride}): max|Δbox|={db:.3e}  "
              f"max|Δcls|={dc:.3e}")
        worst = max(worst, db, dc)

    ok = worst <= args.tol
    print(f"{'PASS' if ok else 'FAIL'}: worst deviation {worst:.3e} "
          f"(tol {args.tol:g})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
