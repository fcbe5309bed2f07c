"""Targetless stereo self-calibration entry point.

Parity with reference stereo_calibration_yolo.py:320-532: for each KITTI
stereo pair (image_2 / image_3), run the targetless calibration pipeline
(ORB -> JAX F-RANSAC -> E -> pose recovery -> cheirality gate), write the
estimated extrinsics into KITTI-format calib files, then run YOLOv8 with the
estimated-or-fallback calibration and save annotated outputs.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu targetless stereo calibration")
    p.add_argument("--dataset_dir", type=str, default="./dataset/kitti")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--min_matches", type=int, default=50)
    p.add_argument("--min_cheirality", type=float, default=0.7)
    p.add_argument("--output_dir", type=str, default="./results/stereo_calib")
    p.add_argument("--run_yolo", action="store_true",
                   help="also run YOLOv8 on the left images with the estimated calib")
    p.add_argument("--yolo_weights", type=str, default=None,
                   help="ultralytics yolov8 .pt to import (random weights if absent)")
    p.add_argument("--imgsz", type=int, default=640,
                   help="YOLOv8 letterbox size (stride-32 multiple)")
    return p.parse_args(argv)


def main(argv=None):
    import cv2

    from sfa3d_tpu.geometry.calibration import read_calib_file
    from sfa3d_tpu.slam.stereo import (
        perform_targetless_stereo_calibration,
        save_estimated_calibration,
    )

    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    left_dir = os.path.join(args.dataset_dir, "training", "image_2")
    right_dir = os.path.join(args.dataset_dir, "training", "image_3")
    calib_dir = os.path.join(args.dataset_dir, "training", "calib")
    ids = sorted(
        os.path.splitext(f)[0] for f in os.listdir(left_dir) if f.endswith(".png")
    )[: args.num_samples]

    yolo = None
    if args.run_yolo:
        # construct (and compile) once, not per frame
        from sfa3d_tpu.models.yolov8 import YOLOv8Detector

        yolo = YOLOv8Detector.from_weights(args.yolo_weights,
                                           imgsz=args.imgsz)

    n_ok = 0
    for sid in ids:
        left = cv2.imread(os.path.join(left_dir, f"{sid}.png"), cv2.IMREAD_GRAYSCALE)
        right = cv2.imread(os.path.join(right_dir, f"{sid}.png"), cv2.IMREAD_GRAYSCALE)
        if left is None or right is None:
            continue
        calib = read_calib_file(os.path.join(calib_dir, f"{sid}.txt"))
        K = calib["P2"].reshape(3, 4)[:, :3]

        result = perform_targetless_stereo_calibration(
            left, right, K,
            min_matches=args.min_matches, min_cheirality=args.min_cheirality,
        )
        status = "OK" if result.success else f"FAIL ({result.reason})"
        print(f"{sid}: {result.n_matches} matches, {result.n_inliers} inliers, "
              f"cheirality {result.cheirality_fraction:.2f} -> {status}")
        if result.success:
            n_ok += 1
        save_estimated_calibration(
            os.path.join(args.output_dir, f"{sid}_estimated_calib.txt"), calib, result
        )

        if yolo is not None and result.success:
            img = cv2.imread(os.path.join(left_dir, f"{sid}.png"))
            boxes, confs, classes = yolo(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            for (x, y, w, h), c in zip(boxes, confs):
                cv2.rectangle(img, (x, y), (x + w, y + h), (0, 255, 0), 2)
            cv2.imwrite(os.path.join(args.output_dir, f"{sid}_yolo.jpg"), img)

    print(f"calibrated {n_ok}/{len(ids)} pairs successfully")


if __name__ == "__main__":
    main()
