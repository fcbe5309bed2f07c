"""End-to-end smoke of the fusion CLIs — the reference's test4/5/6 + slam
surfaces (/root/reference/test6.py:474-637, slam.py:361-525) driven through
`python -m sfa3d_tpu.cli fuse` / `... slam` main() on the mini-KITTI fixture:
both detectors run (YOLOv8 at a small --imgsz to keep the CPU compile cheap),
the Bayesian fusion + Gaussian soft-NMS path executes, and the artifacts the
reference's scripts produce (annotated frames, side-by-side comparisons, the
detection-count dashboard) land on disk.
"""

import os

import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    return write_mini_kitti(str(tmp_path_factory.mktemp("kitti")), n_frames=2)


def test_fuse_cli_end_to_end(mini_kitti, tmp_path):
    from sfa3d_tpu.cli.fuse import main as fuse_main

    out = str(tmp_path / "fusion_out")
    fuse_main([
        "--dataset_dir", mini_kitti,
        "--output_dir", out,
        "--mode", "bayesian", "--gaussian_nms",
        "--confidence_threshold", "0.0",
        "--peak_thresh", "0.0",
        "--imgsz", "64",
        "--side_by_side",
        "--num_samples", "1",
    ])
    assert os.path.isfile(os.path.join(out, "000000_fused.jpg"))
    assert os.path.isfile(os.path.join(out, "000000_yolov8.jpg"))
    assert os.path.isfile(os.path.join(out, "000000_sfa3d.jpg"))
    summary = open(os.path.join(out, "summary.txt")).read()
    assert "mode: bayesian" in summary and "frames: 1" in summary


def test_fuse_cli_artifact_end_to_end(mini_kitti, tmp_path):
    """Deployment loop closed: export the FUSED pipeline to a StableHLO
    artifact, then drive the fuse CLI from that artifact alone (--artifact)
    — weights, fusion config, and camera geometry all baked; no model
    rebuild. The artifact's letterbox geometry must match the fixture's
    375x1242 frames (the export default img_hw)."""
    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.cli.fuse import main as fuse_main
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.models.yolov8 import YOLOv8
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.export import export_fused, save_exported

    model = create_model("fpn_resnet_18")
    kvars = init_detector(model, jax.random.PRNGKey(0))
    yolo = YOLOv8(scale="n")
    yvars = yolo.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    exported, manifest = export_fused(
        model, kvars, yolo, yvars, batch=1, letterbox=64,
        K=10, max_yolo=10, peak_thresh=0.0,
    )
    path = str(tmp_path / "fused.sfa3dx")
    save_exported(path, exported, manifest)

    out = str(tmp_path / "artifact_out")
    fuse_main([
        "--dataset_dir", mini_kitti,
        "--output_dir", out,
        "--artifact", path,
        "--num_samples", "1",
    ])
    assert os.path.isfile(os.path.join(out, "000000_fused.jpg"))
    summary = open(os.path.join(out, "summary.txt")).read()
    assert "mode: artifact" in summary and "frames: 1" in summary

    # --side_by_side needs the separate branches -> explicit refusal
    with pytest.raises(SystemExit):
        fuse_main(["--dataset_dir", mini_kitti, "--output_dir", out,
                   "--artifact", path, "--side_by_side"])


def test_slam_cli_end_to_end(mini_kitti, tmp_path):
    from sfa3d_tpu.cli.slam import main as slam_main

    out = str(tmp_path / "slam_out")
    slam_main([
        "--dataset_dir", mini_kitti,
        "--output_dir", out,
        "--calib_method", "KITTI_DATASET_CALIB",
        "--use_pnp",
        "--confidence_threshold", "0.0",
        "--peak_thresh", "0.0",
        "--imgsz", "64",
        "--num_samples", "1",
    ])
    assert os.path.isfile(os.path.join(out, "000000_slam.jpg"))
