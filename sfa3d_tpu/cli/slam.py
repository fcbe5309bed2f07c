"""Dynamic-calibration fusion entry point.

Parity with reference slam.py / msac.py main loops: the fusion pipeline of
cli/fuse.py, but per-frame calibration comes from a pluggable SLAM source
(--calib_method) instead of static files; --use_pnp selects the msac.py
variant (real RANSAC PnP over simulated correspondences) vs. the slam.py
drift-only simulation.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    from sfa3d_tpu.slam import SLAM_METHODS

    p = argparse.ArgumentParser(description="sfa3d_tpu dynamic-calibration fusion (slam.py/msac.py parity)")
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA weights of an --ema_decay run")
    p.add_argument("--yolo_weights", type=str, default=None,
                   help="ultralytics yolov8 .pt to import (random weights if absent)")
    p.add_argument("--imgsz", type=int, default=640,
                   help="YOLOv8 letterbox size (stride-32 multiple)")
    p.add_argument("--dataset_dir", type=str, default="./dataset/kitti")
    p.add_argument("--calib_method", type=str, default="KITTI_DATASET_CALIB",
                   choices=list(SLAM_METHODS))
    p.add_argument("--use_pnp", action="store_true",
                   help="msac.py variant: real RANSAC PnP on simulated correspondences")
    p.add_argument("--mode", type=str, default="bayesian",
                   choices=["nms", "weighted", "bayesian"])
    p.add_argument("--confidence_threshold", type=float, default=0.25)
    p.add_argument("--fusion_iou_threshold", type=float, default=0.7)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--output_dir", type=str, default="./results/slam_fusion")
    return p.parse_args(argv)


def main(argv=None):
    import cv2

    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.fusion.pipeline import fuse_frame
    from sfa3d_tpu.geometry.calibration import KittiCalibration
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.models.yolov8 import YOLOv8Detector
    from sfa3d_tpu.pipeline import detect_frames
    from sfa3d_tpu.slam import get_calibration_from_slam

    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)
    yolo = YOLOv8Detector.from_weights(args.yolo_weights, imgsz=args.imgsz)

    dataset = KittiDataset(args.dataset_dir, mode="test", num_samples=args.num_samples)
    for idx in range(len(dataset)):
        sample = dataset[idx]
        img = cv2.imread(sample.img_path)
        if img is None:
            img = np.zeros((375, 1242, 3), np.uint8)

        # dynamic calibration for this frame (slam.py:361-525)
        slam_calib = get_calibration_from_slam(
            sample.img_path,
            slam_method=args.calib_method,
            img_shape=img.shape,
            use_pnp=args.use_pnp,
            calib_file=sample.img_path.replace("image_2", "calib").replace(".png", ".txt"),
        )
        calib = KittiCalibration(None)
        calib.set_matrices(**slam_calib)  # injectable-calibration path

        out = detect_frames(
            model, variables, sample.points[None], sample.valid[None],
            K=50, peak_thresh=args.peak_thresh,
        )
        yb, ys, yc = yolo(cv2.cvtColor(img, cv2.COLOR_BGR2RGB),
                          conf=args.confidence_threshold)
        result = fuse_frame(
            yb, ys, yc,
            np.asarray(out["boxes_real"])[0],
            np.asarray(out["detections"])[0, :, 0],
            np.asarray(out["mask"])[0],
            calib, img.shape[:2],
            mode=args.mode,
            confidence_threshold=args.confidence_threshold,
            fusion_iou_threshold=args.fusion_iou_threshold,
        )
        for (x, y, w, h), score, src in zip(result["boxes"], result["scores"], result["source"]):
            color = [(0, 255, 255), (255, 0, 0), (0, 255, 0)][int(src)]
            cv2.rectangle(img, (x, y), (x + w, y + h), color, 2)
        cv2.putText(img, f"calib: {args.calib_method}{' +PnP' if args.use_pnp else ''}",
                    (10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        cv2.imwrite(os.path.join(args.output_dir, f"{sample.sample_id:06d}_slam.jpg"), img)
        print(f"frame {sample.sample_id}: {len(result['boxes'])} fused dets "
              f"[{args.calib_method}]")


if __name__ == "__main__":
    main()
