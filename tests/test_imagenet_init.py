"""ImageNet-pretrained backbone initialization (reference
fpn_resnet.py:265-286: model_zoo.load_url(resnet{N}-imagenet) with
strict=False). The torchvision resnet key layout IS the reference backbone's
key layout, so the reference model's own backbone state_dict doubles as a
faithful stand-in for a torchvision ImageNet checkpoint here (no network
egress to fetch the real one)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import ref_loader
from sfa3d_tpu.config.train import parse_train_configs
from sfa3d_tpu.models import create_model
from sfa3d_tpu.models.kfpn import HEADS
from sfa3d_tpu.models.port import load_imagenet_backbone, port_torchvision_backbone
from sfa3d_tpu.pipeline import init_detector


@pytest.fixture(scope="module")
def torchvision_style_sd():
    import torch

    if not ref_loader.available():
        pytest.skip("reference tree absent")
    fpn = ref_loader.load("models.fpn_resnet")
    torch.manual_seed(11)
    ref_model = fpn.get_pose_net(18, dict(HEADS), 64, imagenet_pretrained=False)
    sd = {
        k: v
        for k, v in ref_model.state_dict().items()
        if k.startswith(("conv1", "bn1", "layer"))
    }
    # torchvision checkpoints also carry the classifier head; strict=False
    # (and our port) must ignore it
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def test_backbone_merged_heads_untouched(torchvision_style_sd, tmp_path):
    import torch

    path = tmp_path / "resnet18-0000.pth"
    torch.save(torchvision_style_sd, path)

    model = create_model("fpn_resnet_18")
    init_vars = init_detector(model, jax.random.PRNGKey(0))
    merged = load_imagenet_backbone(init_vars, 18, str(path))

    sd = {k: v.numpy() for k, v in torchvision_style_sd.items()}
    bb = merged["params"]["backbone"]
    np.testing.assert_array_equal(
        bb["stem"]["conv"]["kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(
        bb["layer4_1"]["cb2"]["conv"]["kernel"],
        sd["layer4.1.conv2.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        bb["layer2_0"]["downsample"]["conv"]["kernel"],
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        merged["batch_stats"]["backbone"]["stem"]["bn"]["mean"],
        sd["bn1.running_mean"],
    )
    np.testing.assert_array_equal(
        merged["batch_stats"]["backbone"]["layer3_1"]["cb2"]["bn"]["var"],
        sd["layer3.1.bn2.running_var"],
    )
    # non-backbone params keep their init values
    for head in ("fpn0_hm_cen", "conv_up_level1"):
        got = jax.tree_util.tree_map(
            np.asarray, merged["params"][head]
        )
        want = jax.tree_util.tree_map(np.asarray, init_vars["params"][head])
        jax.tree_util.tree_map(np.testing.assert_array_equal, got, want)

    # the merged tree is a working model
    out = model.apply(merged, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_shape_guard_rejects_mismatched_checkpoint(torchvision_style_sd):
    import torch

    model = create_model("fpn_resnet_18")
    init_vars = init_detector(model, jax.random.PRNGKey(0))
    bad = dict(torchvision_style_sd)
    bad["layer1.0.conv1.weight"] = torch.zeros(64, 64, 1, 1)  # resnet50-like
    with pytest.raises(ValueError, match="wrong"):
        port_torchvision_backbone(bad, init_vars, 18)


def test_missing_checkpoint_fails_loudly(tmp_path, monkeypatch):
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    model = create_model("fpn_resnet_18")
    init_vars = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    with pytest.raises(FileNotFoundError, match="imagenet_weights"):
        load_imagenet_backbone(init_vars, 18, None)


def test_cli_flags_reach_model_config():
    cfg = parse_train_configs(
        ["--imagenet_pretrained", "--imagenet_weights", "/tmp/r18.pth"]
    )
    assert cfg.model.imagenet_pretrained is True
    assert cfg.model.imagenet_weights == "/tmp/r18.pth"
    assert parse_train_configs([]).model.imagenet_pretrained is False
