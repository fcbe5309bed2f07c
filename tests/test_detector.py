"""High-level Detector facade: detect, checkpoint loading, KITTI results."""

import os

import numpy as np
import pytest


def test_detector_random_weights(rng):
    from sfa3d_tpu import Detector
    from sfa3d_tpu.data.synthetic import synthetic_scene

    det = Detector(dtype="float32", peak_thresh=0.0)
    scan, _ = synthetic_scene(seed=1)
    dets = det.detect(scan)
    assert isinstance(dets, list)
    if dets:
        d = dets[0]
        assert set(d) == {
            "class_id", "class_name", "score", "x", "y", "z", "h", "w", "l", "yaw"
        }
        assert 0 <= d["x"] <= 50 and -25 <= d["y"] <= 25


def test_detector_from_orbax_checkpoint(tmp_path, rng):
    import jax

    from sfa3d_tpu import Detector
    from sfa3d_tpu.config.train import OptimConfig
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.parallel import create_train_state
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.checkpoint import save_checkpoint
    from sfa3d_tpu.runtime.schedules import create_optimizer

    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(5), input_size=(64, 64))
    tx = create_optimizer(OptimConfig(), 2, 1)
    state = create_train_state(model, variables, tx)
    path = save_checkpoint(str(tmp_path), "facade", state, epoch=1)

    det = Detector(checkpoint=path, dtype="float32")
    # loaded params match what was saved
    import jax.numpy as jnp

    a = jax.tree_util.tree_leaves(det.variables["params"])[0]
    b = jax.tree_util.tree_leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detector_from_torch_checkpoint(tmp_path):
    import torch

    from tests import ref_loader

    if not ref_loader.available():
        pytest.skip("reference tree absent")
    from sfa3d_tpu import Detector
    from sfa3d_tpu.models.kfpn import HEADS

    fpn = ref_loader.load("models.fpn_resnet")
    torch.manual_seed(0)
    ref_model = fpn.get_pose_net(18, dict(HEADS), 64, imagenet_pretrained=False)
    pth = str(tmp_path / "Model_fpn_resnet_18_epoch_1.pth")
    torch.save(ref_model.state_dict(), pth)
    det = Detector(checkpoint=pth, dtype="float32")
    assert "params" in det.variables and "batch_stats" in det.variables


def test_write_kitti_results(tmp_path):
    from sfa3d_tpu import Detector
    from sfa3d_tpu.geometry.calibration import KittiCalibration

    det = Detector.__new__(Detector)  # skip model init; only test the writer
    calib = KittiCalibration(None)
    dets = [
        {"class_id": 1, "class_name": "Car", "score": 0.9,
         "x": 10.0, "y": 2.0, "z": -1.5, "h": 1.5, "w": 1.6, "l": 3.9, "yaw": 0.3}
    ]
    path = str(tmp_path / "000001.txt")
    Detector.write_kitti_results(det, dets, calib, path)
    line = open(path).read().strip().split(" ")
    assert line[0] == "Car"
    assert len(line) == 16  # KITTI label row + score
    assert float(line[-1]) == pytest.approx(0.9)


def test_fused_detector_facade(rng):
    """FusedDetector: one call takes scan + image + calib and returns fused
    2D boxes with sources plus the 3D branch."""
    from sfa3d_tpu import FusedDetector
    from sfa3d_tpu.data.synthetic import synthetic_scene
    from sfa3d_tpu.geometry.calibration import KittiCalibration

    fd = FusedDetector(imgsz=64)
    scan, _ = synthetic_scene(seed=1)
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    out = fd.detect(scan, img, KittiCalibration(None))
    assert set(out) == {"boxes", "scores", "classes", "source", "boxes_3d"}
    assert out["boxes"].shape[1:] == (4,)
    assert out["boxes_3d"].shape[1:] == (8,)
    assert len(out["boxes"]) == len(out["scores"]) == len(out["source"])
    assert set(np.unique(out["source"])) <= {0, 1, 2}
