"""End-to-end smoke of the visualization entry points the reference treats
as its demo surface: `python -m sfa3d_tpu.cli test` (reference test.py:31-225
— composite images + staged per-class heatmap dumps) and `... demo
--two_sides` (demo_2_sides.py — front+back BEV video over a raw drive).
Driven through main() on synthetic fixtures; asserts the reference's
artifact set lands on disk (composites, raw-BEV dump, pre/post-sigmoid
heatmaps per class, a playable .avi with one frame per drive scan).
"""

import os

import pytest

cv2 = pytest.importorskip("cv2")


def test_test_cli_end_to_end(tmp_path):
    from sfa3d_tpu.cli.test import main as test_main
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    root = write_mini_kitti(str(tmp_path / "kitti"), n_frames=2)
    out = str(tmp_path / "results")
    test_main([
        "--dataset_dir", root,
        "--output_dir", out,
        "--save_test_output",
        "--peak_thresh", "0.0",
        "--num_samples", "1",
    ])
    assert os.path.isfile(os.path.join(out, "000000.jpg"))
    viz = os.path.join(out, "visualizations")
    assert os.path.isfile(os.path.join(viz, "000000_raw_bev.jpg"))
    # staged dumps: pre- and post-sigmoid center heatmaps for all 3 classes
    for cls in range(3):
        for tag in ("raw", "sigmoid"):
            assert os.path.isfile(
                os.path.join(viz, f"000000_{tag}_heatmap_cls{cls}.jpg")
            ), f"missing {tag} heatmap for class {cls}"


def test_eval_cli_end_to_end(tmp_path):
    """eval main() (beyond-reference KITTI AP entry) over the fixture val
    split: returns the full results dict — per-class AP, mAP, and the
    Easy/Moderate/Hard table the reference publishes without code."""
    from sfa3d_tpu.cli.eval import main as eval_main
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    root = write_mini_kitti(str(tmp_path / "kitti"), n_frames=2, cameras=False)
    results_dir = str(tmp_path / "kitti_results")
    res = eval_main([
        "--dataset_dir", root,
        "--split", "val",
        "--num_samples", "2",
        "--peak_thresh", "0.0",
        "--save_results", results_dir,
    ])
    assert 0.0 <= res["mAP"] <= 1.0
    assert set(res["by_difficulty"]) == {"Easy", "Moderate", "Hard"}
    for bucket in res["by_difficulty"].values():
        assert 0.0 <= bucket["mAP"] <= 1.0

    # KITTI submission-format dump: one file per frame, 16-column rows
    # (15 devkit label fields + trailing score), valid class names
    for sid in ("000000", "000001"):
        rows = [l.split() for l in open(os.path.join(results_dir, f"{sid}.txt"))]
        assert rows, f"{sid}.txt is empty (peak_thresh 0 must yield rows)"
        for r in rows:
            assert len(r) == 16 and r[0] in ("Pedestrian", "Car", "Cyclist")
            assert 0.0 <= float(r[15]) <= 1.0  # score column


def test_stereo_calib_cli_end_to_end(tmp_path, capsys):
    """stereo-calib main() over the fixture's rendered image_2/image_3 pair
    (true 0.54 m baseline): the pair must actually CALIBRATE (1/1), not
    just produce output files."""
    from sfa3d_tpu.cli.stereo_calib import main as sc_main
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    root = write_mini_kitti(str(tmp_path / "kitti"), n_frames=1)
    out = str(tmp_path / "out")
    sc_main([
        "--dataset_dir", root,
        "--num_samples", "1",
        "--output_dir", out,
        "--min_matches", "30",
    ])
    assert os.path.isfile(os.path.join(out, "000000_estimated_calib.txt"))
    assert "calibrated 1/1 pairs successfully" in capsys.readouterr().out


def test_argoverse_cli_end_to_end(tmp_path):
    """argoverse-test main() on the mini-Argoverse fixture. The runner has
    per-frame try/except resilience (argo_sfa_test.py:219-383 parity), so a
    silently-failing frame would still exit 0 — the real assertion is that
    the per-frame artifacts (written AFTER detection + GT projection) land."""
    from sfa3d_tpu.cli.argoverse_test import main as argo_main
    from sfa3d_tpu.data.argoverse import write_mini_argoverse

    root = write_mini_argoverse(str(tmp_path / "argo"), n_frames=1)
    out = str(tmp_path / "results")
    argo_main([
        "--dataset_dir", root,
        "--output_dir", out,
        "--peak_thresh", "0.0",
        "--num_samples", "1",
    ])
    files = os.listdir(out)
    assert any(f.endswith("_bev.jpg") for f in files), files
    assert any(f.endswith("_rgb.jpg") for f in files), files


def test_demo_cli_two_sides_end_to_end(tmp_path):
    from sfa3d_tpu.cli.demo import main as demo_main
    from sfa3d_tpu.data.synthetic import write_mini_drive

    drive = write_mini_drive(str(tmp_path / "drive"), n_frames=2)
    out = str(tmp_path / "results")
    demo_main([
        "--drive_dir", drive,
        "--output_dir", out,
        "--two_sides",
        "--peak_thresh", "0.0",
    ])
    avi = os.path.join(out, "demo_fpn_resnet_18.avi")
    assert os.path.isfile(avi)
    cap = cv2.VideoCapture(avi)
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        ok, frame = cap.read()
    finally:
        cap.release()
    assert n == 2, f"expected one video frame per drive scan, got {n}"
    assert ok and frame is not None and frame.any(), "first frame unreadable/black"


def test_track_cli_end_to_end(tmp_path):
    """3D MOT demo (beyond-reference, sfa3d_tpu/tracking/): detector ->
    fixed-slot Kalman tracker -> id-annotated BEV video. peak_thresh 0
    floods the tracker with all 50 random-weight detections per frame, so
    association/birth/death all run."""
    from sfa3d_tpu.cli.track import main as track_main
    from sfa3d_tpu.data.synthetic import write_mini_drive

    drive = write_mini_drive(str(tmp_path / "drive"), n_frames=2, motion=True)
    out = str(tmp_path / "results")
    track_main([
        "--drive_dir", drive,
        "--output_dir", out,
        "--peak_thresh", "0.0",
        "--min_hits", "1",
        "--show_coasting",
    ])
    avi = os.path.join(out, "track_fpn_resnet_18.avi")
    assert os.path.isfile(avi)
    cap = cv2.VideoCapture(avi)
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        ok, frame = cap.read()
    finally:
        cap.release()
    assert n == 2, f"expected one video frame per drive scan, got {n}"
    assert ok and frame is not None and frame.any(), "first frame unreadable/black"
