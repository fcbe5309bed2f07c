"""Model zoo: KFPN (flagship), deconv CenterNet variant, YOLOv8 (JAX),
torch-checkpoint porting. `create_model` mirrors the reference dispatch
(models/model_utils.py:25-43) on arch strings like 'fpn_resnet_18'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_model(arch: str = "fpn_resnet_18", head_conv: int = 64, dtype=jnp.float32,
                 s2d_stem: bool = False, fused_heads: bool = False):
    """Arch string -> flax module (model_utils.py:25-43 dispatch).

    `s2d_stem=True` uses the space-to-depth stem reformulation (exactly
    weight-transformable from standard checkpoints via
    kfpn.convert_variables_to_s2d). `fused_heads=True` runs the 5 per-head
    towers of each pyramid level as ONE wide conv pair (exactly
    weight-transformable via kfpn.fuse_head_params; bit-exact on TPU,
    ~1e-10 conv-tiling reassociation on CPU —
    tests/test_model.py::test_fused_heads_bit_exact)."""
    from sfa3d_tpu.models.kfpn import KFPN
    from sfa3d_tpu.models.centernet_deconv import DeconvCenterNet

    parts = arch.split("_")
    num_layers = int(parts[-1])
    if arch.startswith("fpn_resnet"):
        return KFPN(num_layers=num_layers, head_conv=head_conv, dtype=dtype,
                    s2d_stem=s2d_stem, fused_heads=fused_heads)
    if arch.startswith("resnet"):
        if s2d_stem or fused_heads:
            raise ValueError(
                "s2d_stem/fused_heads are only implemented for fpn_resnet_* "
                f"archs; got arch={arch!r}"
            )
        return DeconvCenterNet(num_layers=num_layers, head_conv=head_conv, dtype=dtype)
    raise ValueError(f"unknown arch: {arch}")


def load_variables(pretrained_path, arch: str = "fpn_resnet_18", model=None,
                   rng_seed: int = 0, use_ema: bool = False):
    """Unified checkpoint loading for entry points: reference torch .pth,
    this framework's Orbax composite directory, or None -> fresh init (with
    a warning, since silent random weights produce garbage detections).
    use_ema selects the EMA weights of an --ema_decay training run (Orbax
    directories only — torch .pth checkpoints carry raw weights)."""
    import os

    from sfa3d_tpu.pipeline import init_detector

    model = model or create_model(arch)
    if pretrained_path:
        if pretrained_path.endswith(".pth"):
            if use_ema:
                raise ValueError("use_ema applies to Orbax checkpoint "
                                 "directories, not torch .pth files")
            from sfa3d_tpu.models.port import load_torch_checkpoint

            num_layers = int(arch.split("_")[-1])
            return load_torch_checkpoint(pretrained_path, num_layers, arch)
        if os.path.isdir(pretrained_path):
            from sfa3d_tpu.runtime.checkpoint import load_params_only

            return load_params_only(pretrained_path, use_ema=use_ema)
        raise FileNotFoundError(
            f"checkpoint not found or unrecognized: {pretrained_path} "
            "(expected a torch .pth file or an Orbax checkpoint directory)"
        )
    print("WARNING: no --pretrained_path given; using RANDOM weights")
    return init_detector(model, jax.random.PRNGKey(rng_seed))


def get_num_parameters(params) -> int:
    """Total trainable parameter count (model_utils.py:46-53)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def clamped_sigmoid(x):
    """sigmoid clamped to [1e-4, 1 - 1e-4] (utils/torch_utils.py:44-45),
    computed in AT LEAST float32 (bf16 inputs upcast; f64 numerics-audit
    inputs stay f64 — see scripts/spatial_parity_check.py).

    The clamp is STRAIGHT-THROUGH: forward values match the reference's
    torch.clamp exactly, but the backward keeps the plain sigmoid gradient.
    torch.clamp's zero gradient outside the interval is a saturation TRAP
    the reference inherits: a heatmap logit pushed below sigmoid^-1(1e-4)
    (~-9.2) freezes — positives at that cell can never recover. Measured:
    the Argoverse 8-frame overfit pin drove the Vehicle channel sub-floor
    (prediction pinned at exactly 1e-4 at its own target peaks, recovery
    gradient exactly 0) and Vehicle AP stuck at 0.0 while other classes hit
    1.0. Deliberate gradient-only divergence (values identical; documented
    in docs/TECHNICAL.md)."""
    dt = jnp.promote_types(x.dtype, jnp.float32)
    p = jax.nn.sigmoid(x.astype(dt))
    return p + jax.lax.stop_gradient(jnp.clip(p, 1e-4, 1.0 - 1e-4) - p)
