"""Model parity: our flax KFPN / deconv CenterNet with ported weights must
reproduce the reference torch networks within 1e-3 (BASELINE.md tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import ref_loader
from sfa3d_tpu.models import create_model, get_num_parameters
from sfa3d_tpu.models.kfpn import HEADS, upsample2x_align_corners, upsample2x_nearest
from sfa3d_tpu.models.port import port_deconv_state_dict, port_kfpn_state_dict
from sfa3d_tpu.pipeline import init_detector


def _torch_ref_model(arch="fpn_resnet", num_layers=18):
    import torch

    if arch == "fpn_resnet":
        mod = ref_loader.load("models.fpn_resnet")
    else:
        mod = ref_loader.load("models.resnet")
    torch.manual_seed(0)
    model = mod.get_pose_net(
        num_layers=num_layers, heads=dict(HEADS), head_conv=64, imagenet_pretrained=False
    )
    model.eval()
    return model


def test_upsample_align_corners_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(0, 1, (2, 19, 19, 8)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        scale_factor=2, mode="bilinear", align_corners=True,
    ).numpy()
    ours = np.transpose(np.asarray(upsample2x_align_corners(jnp.asarray(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(0, 1, (1, 76, 76, 4)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), size=(152, 152)
    ).numpy()
    ours = np.transpose(np.asarray(upsample2x_nearest(jnp.asarray(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_kfpn_matches_reference_with_ported_weights(rng):
    import torch

    ref_model = _torch_ref_model("fpn_resnet")
    variables = port_kfpn_state_dict(ref_model.state_dict(), num_layers=18)

    model = create_model("fpn_resnet_18")
    x = rng.normal(0, 0.5, (1, 128, 128, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    for head in HEADS:
        ref_h = ref_out[head].numpy()
        ours_h = np.transpose(np.asarray(ours[head]), (0, 3, 1, 2))
        np.testing.assert_allclose(ours_h, ref_h, atol=1e-3, err_msg=head)


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_deconv_matches_reference_with_ported_weights(rng):
    import torch

    ref_model = _torch_ref_model("resnet")
    variables = port_deconv_state_dict(ref_model.state_dict(), num_layers=18)

    model = create_model("resnet_18")
    x = rng.normal(0, 0.5, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    for head in HEADS:
        ref_h = ref_out[head].numpy()
        ours_h = np.transpose(np.asarray(ours[head]), (0, 3, 1, 2))
        np.testing.assert_allclose(ours_h, ref_h, atol=1e-3, err_msg=head)


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_param_count_matches_reference():
    ref_model = _torch_ref_model("fpn_resnet")
    ref_n = sum(p.numel() for p in ref_model.parameters())
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    assert get_num_parameters(variables["params"]) == ref_n


def test_head_shapes():
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(608, 608))
    out = model.apply(variables, jnp.zeros((2, 608, 608, 3)), train=False)
    for head, ch in HEADS.items():
        assert out[head].shape == (2, 152, 152, ch), head


def test_fused_heads_bit_exact(rng):
    """KFPN(fused_heads=True) with fuse_head_params-transformed weights must
    reproduce the standard per-head towers exactly."""
    from sfa3d_tpu.models.kfpn import KFPN, fuse_head_params

    std = create_model("fpn_resnet_18")
    v = init_detector(std, jax.random.PRNGKey(1), input_size=(64, 64))
    fused = KFPN(num_layers=18, fused_heads=True)
    vf = fuse_head_params(v)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    o1 = std.apply(v, x, train=False)
    o2 = fused.apply(vf, x, train=False)
    for k in o1:
        # bit-exact on TPU; CPU conv algorithms accumulate differently (~3e-5)
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]), atol=1e-4)


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_export_roundtrip_to_torch(rng, tmp_path):
    """Our params -> torch state_dict -> reference model must reproduce our
    outputs (the migration path BACK to the reference)."""
    import torch

    from sfa3d_tpu.models.port import save_torch_checkpoint

    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(9), input_size=(64, 64))
    pth = str(tmp_path / "exported.pth")
    save_torch_checkpoint(pth, variables)

    mod = ref_loader.load("models.fpn_resnet")
    ref_model = mod.get_pose_net(18, dict(HEADS), 64, imagenet_pretrained=False)
    missing, unexpected = ref_model.load_state_dict(
        torch.load(pth, weights_only=True), strict=True
    )
    ref_model.eval()

    x = rng.normal(0, 0.5, (1, 64, 64, 3)).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    for head in HEADS:
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours[head]), (0, 3, 1, 2)),
            ref[head].numpy(), atol=1e-3, err_msg=head,
        )


@pytest.mark.parametrize("arch", ["fpn_resnet_34", "resnet_34"])
def test_deeper_arch_variants(arch):
    """resnet_spec covers 18/34/50/101/152 (fpn_resnet.py:289-293); 34 shares
    the BasicBlock channel plan with 18 and must produce the same head grid."""
    model = create_model(arch)
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    for head, ch in HEADS.items():
        assert out[head].shape == (1, 16, 16, ch), (arch, head)


def test_s2d_stem_rejected_for_deconv_arch():
    """s2d_stem is a KFPN-only reformulation; silently ignoring it on the
    deconv arch would hand a user an unmodified stem while they benchmark
    'the s2d variant'."""
    with pytest.raises(ValueError, match="s2d_stem"):
        create_model("resnet_18", s2d_stem=True)


def test_bottleneck_kfpn_works():
    """fpn_resnet_50: the torch reference CRASHES here (its lateral convs
    hardcode BasicBlock input widths, fpn_resnet.py:129-131, while
    Bottleneck stages emit 4x channels); flax infers input channels, so the
    Bottleneck KFPN works in this framework — a strict superset."""
    model = create_model("fpn_resnet_50")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["hm_cen"].shape == (1, 16, 16, 3)


def test_s2d_stem_exact_parity(rng):
    """Space-to-depth stem reformulation (resnet.stem_kernel_to_s2d): the
    transformed 4x4/s1 conv over the space-to-depth input must be
    numerically equivalent to the standard 7x7/s2 stem, end-to-end through
    the full KFPN (the transform is exact; tolerance covers f32
    reassociation only)."""
    from sfa3d_tpu.models.kfpn import convert_variables_to_s2d

    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(3), input_size=(64, 64))
    s2d_model = create_model("fpn_resnet_18", s2d_stem=True)
    s2d_vars = convert_variables_to_s2d(variables)
    assert s2d_vars["params"]["backbone"]["stem"]["conv"]["kernel"].shape == (4, 4, 12, 64)

    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    a = model.apply(variables, jnp.asarray(x), train=False)
    b = s2d_model.apply(s2d_vars, jnp.asarray(x), train=False)
    for head in HEADS:
        np.testing.assert_allclose(
            np.asarray(a[head]), np.asarray(b[head]), atol=1e-5, err_msg=head
        )


def test_s2d_stem_conv_only_parity(rng):
    """The stem transform in isolation, at the production 608 input size
    (bit-level check of window alignment incl. both boundaries)."""
    from sfa3d_tpu.models.resnet import ConvBN

    x = rng.uniform(-1, 1, (1, 608, 608, 3)).astype(np.float32)
    std = ConvBN(64, 7, 2)
    k = std.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_std = std.apply(k, jnp.asarray(x))

    from sfa3d_tpu.models.resnet import stem_kernel_to_s2d

    s2d = ConvBN(64, 7, 2, s2d=True)
    import copy
    k2 = jax.tree_util.tree_map(np.asarray, k)
    k2 = {"params": copy.deepcopy(k2["params"]), "batch_stats": k2["batch_stats"]}
    k2["params"]["conv"]["kernel"] = stem_kernel_to_s2d(k2["params"]["conv"]["kernel"])
    out_s2d = s2d.apply(k2, jnp.asarray(x))
    assert out_s2d.shape == out_std.shape == (1, 304, 304, 64)
    np.testing.assert_allclose(
        np.asarray(out_std), np.asarray(out_s2d), atol=2e-6
    )


def test_fused_heads_init_parity():
    """A FRESH KFPN(fused_heads=True) init must carry the reference head
    init (fpn_resnet.py:265-281) per block: hm bias -2.19 / lecun kernel,
    other heads bias 0 / N(0, 0.001) kernels, zeros off-block (the same
    block-diagonal layout fuse_head_params produces)."""
    from sfa3d_tpu.models.kfpn import HEADS, KFPN

    fused = KFPN(num_layers=18, fused_heads=True)
    v = fused.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    heads = tuple(sorted(HEADS.items()))
    head_conv = 64
    for idx in range(3):
        k = np.asarray(v["params"][f"fused{idx}_conv2"]["kernel"])
        b = np.asarray(v["params"][f"fused{idx}_conv2"]["bias"])
        off_in = off_out = 0
        for head, out_ch in heads:
            blk = k[0, 0, off_in:off_in + head_conv, off_out:off_out + out_ch]
            bias_blk = b[off_out:off_out + out_ch]
            if "hm" in head:
                np.testing.assert_allclose(bias_blk, -2.19, atol=1e-6)
                assert 0.01 < blk.std() < 1.0  # lecun_normal, fan_in=64
            else:
                np.testing.assert_allclose(bias_blk, 0.0, atol=1e-6)
                assert 0.0 < blk.std() < 0.01  # N(0, 0.001)
            # off-block rows (other heads' hidden channels) must be zero
            mask = np.ones(k.shape[2], bool)
            mask[off_in:off_in + head_conv] = False
            np.testing.assert_array_equal(
                k[0, 0, mask, off_out:off_out + out_ch], 0.0
            )
            off_in += head_conv
            off_out += out_ch
