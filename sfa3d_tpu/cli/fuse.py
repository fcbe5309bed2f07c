"""Camera-LiDAR fusion entry point.

Parity with reference test4.py (--mode nms), test5.py (--mode weighted),
test6.py (--mode bayesian, optionally --gaussian_nms): per test-split frame,
run YOLOv8 on the camera image + SFA3D on the scan, fuse, draw labeled boxes
color-coded by source, and emit the detection-count dashboard
(test6.py:396-471 analog, written as a summary text file + composite image).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu fusion (test4/5/6 parity)")
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA weights of an --ema_decay run")
    p.add_argument("--yolo_weights", type=str, default=None,
                   help="ultralytics yolov8 .pt to import (random weights if absent)")
    p.add_argument("--dataset_dir", type=str, default="./dataset/kitti")
    p.add_argument("--mode", type=str, default="bayesian",
                   choices=["nms", "weighted", "bayesian"])
    p.add_argument("--confidence_threshold", type=float, default=0.25)
    p.add_argument("--fusion_iou_threshold", type=float, default=0.7)
    p.add_argument("--nms_threshold", type=float, default=0.5)
    p.add_argument("--gaussian_nms", action="store_true")
    p.add_argument("--gaussian_sigma", type=float, default=0.5)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--output_dir", type=str, default="./results/fusion")
    p.add_argument("--side_by_side", action="store_true",
                   help="also save separate {id}_yolov8.jpg / {id}_sfa3d.jpg "
                        "comparison images (test3.py parity)")
    p.add_argument("--imgsz", type=int, default=640,
                   help="YOLOv8 letterbox size (stride-32 multiple; "
                        "ultralytics imgsz)")
    p.add_argument("--artifact", type=str, default=None, metavar="PATH.sfa3dx",
                   help="run frames through a FUSED AOT export (cli export "
                        "--fused) instead of rebuilding the models: weights, "
                        "fusion mode/thresholds, and camera geometry come "
                        "baked from the artifact manifest")
    return p.parse_args(argv)


SOURCE_COLORS = {0: (0, 255, 255), 1: (255, 0, 0), 2: (0, 255, 0)}  # yolo/sfa/fused
SOURCE_NAMES = {0: "YOLOv8", 1: "SFA3D", 2: "Fused"}


def _run_artifact_frame(artifact_detector, sample, img_bgr, calib):
    """One frame through a fused AOT export via the ArtifactFusedDetector
    facade (scan repadded to the baked point budget, camera letterboxed to
    the baked geometry); geometry mismatch becomes a clean CLI error."""
    import cv2
    import numpy as np

    try:
        return artifact_detector.detect(
            sample.points[np.asarray(sample.valid)],
            cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB),
            calib,
        )
    except ValueError as e:
        raise SystemExit(str(e)) from e


def main(argv=None):
    import cv2

    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.fusion.pipeline import fuse_frame
    from sfa3d_tpu.geometry.calibration import KittiCalibration
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.models.yolov8 import COCO_NAMES, YOLOv8Detector
    from sfa3d_tpu.pipeline import detect_frames

    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    artifact = None
    if args.artifact:
        if args.side_by_side:
            raise SystemExit(
                "--side_by_side needs the separate YOLO/SFA3D branches; a "
                "fused artifact runs them as one program (drop --artifact "
                "or --side_by_side)"
            )
        from sfa3d_tpu.detector import ArtifactFusedDetector

        try:
            artifact = ArtifactFusedDetector(args.artifact)
        except ValueError as e:
            raise SystemExit(str(e)) from e
        print(
            "fusion config comes baked from the artifact manifest "
            f"({artifact.artifact.manifest.get('fused_kwargs')}); "
            "--mode/threshold flags are ignored"
        )
        model = variables = yolo = None
    else:
        model = create_model(args.arch)
        variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)
        yolo = YOLOv8Detector.from_weights(args.yolo_weights,
                                           imgsz=args.imgsz)

    dataset = KittiDataset(args.dataset_dir, mode="test", num_samples=args.num_samples)
    counts_before, counts_after = [], []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        t0 = time.time()
        img = cv2.imread(sample.img_path)
        if img is None:
            img = np.zeros((375, 1242, 3), np.uint8)
        calib_path = sample.img_path.replace(".png", ".txt").replace("image_2", "calib")
        calib = KittiCalibration(calib_path if os.path.isfile(calib_path) else None)

        if artifact is not None:
            result = _run_artifact_frame(artifact, sample, img, calib)
            dt = time.time() - t0
            # pre-fusion branch counts are not observable from the single
            # fused program; the dashboard records output counts only
            counts_before.append(len(result["boxes"]))
            counts_after.append(len(result["boxes"]))
        else:
            out = detect_frames(
                model, variables, sample.points[None], sample.valid[None],
                K=50, peak_thresh=args.peak_thresh,
            )
            yb, ys, yc = yolo(cv2.cvtColor(img, cv2.COLOR_BGR2RGB), conf=args.confidence_threshold)

            result = fuse_frame(
                yb, ys, yc,
                np.asarray(out["boxes_real"])[0],
                np.asarray(out["detections"])[0, :, 0],
                np.asarray(out["mask"])[0],
                calib, img.shape[:2],
                mode=args.mode,
                confidence_threshold=args.confidence_threshold,
                fusion_iou_threshold=args.fusion_iou_threshold,
                nms_threshold=args.nms_threshold,
                use_gaussian_nms=args.gaussian_nms,
                gaussian_sigma=args.gaussian_sigma,
            )
            dt = time.time() - t0
            counts_before.append(len(yb) + int(np.asarray(out["mask"])[0].sum()))
            counts_after.append(len(result["boxes"]))

        if args.side_by_side:
            # test3.py parity: separate per-model comparison images
            from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image
            import jax.numpy as jnp

            img_y = img.copy()
            for (x, y, w, h), score in zip(yb, ys):
                cv2.rectangle(img_y, (x, y), (x + w, y + h), (0, 255, 255), 2)
                cv2.putText(img_y, f"{score:.2f}", (x, max(0, y - 4)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 255), 1)
            cv2.imwrite(os.path.join(args.output_dir, f"{sample.sample_id:06d}_yolov8.jpg"), img_y)

            img_s = img.copy()
            s2d, sval = project_boxes_to_image(
                jnp.asarray(np.asarray(out["boxes_real"])[0]),
                jnp.asarray(np.asarray(out["detections"])[0, :, 0]),
                jnp.asarray(np.asarray(out["mask"])[0]),
                jnp.asarray(calib.V2C), jnp.asarray(calib.R0), jnp.asarray(calib.P2),
                img_h=img.shape[0], img_w=img.shape[1],
                conf_gate=args.confidence_threshold,
            )
            for (x, y, w, h), ok in zip(np.asarray(s2d).astype(int), np.asarray(sval)):
                if ok:
                    cv2.rectangle(img_s, (x, y), (x + w, y + h), (255, 0, 0), 2)
            cv2.imwrite(os.path.join(args.output_dir, f"{sample.sample_id:06d}_sfa3d.jpg"), img_s)

        for (x, y, w, h), score, cls, src in zip(
            result["boxes"], result["scores"], result["classes"], result["source"]
        ):
            color = SOURCE_COLORS[int(src)]
            cv2.rectangle(img, (x, y), (x + w, y + h), color, 2)
            name = COCO_NAMES[cls] if int(src) != 1 and cls < len(COCO_NAMES) else f"cls{cls}"
            cv2.putText(img, f"{SOURCE_NAMES[int(src)]} {name} {score:.2f}",
                        (x, max(0, y - 5)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        mode_label = "artifact" if artifact is not None else args.mode
        cv2.putText(img, f"{mode_label} fusion  {1.0 / max(dt, 1e-9):.1f} FPS",
                    (10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        cv2.imwrite(os.path.join(args.output_dir, f"{sample.sample_id:06d}_fused.jpg"), img)
        print(f"frame {sample.sample_id}: {counts_before[-1]} -> {counts_after[-1]} dets "
              f"({dt * 1000:.1f} ms)")

    # detection-count dashboard (test6.py:396-471 analog)
    with open(os.path.join(args.output_dir, "summary.txt"), "w") as f:
        if artifact is not None:
            f.write(f"mode: artifact ({args.artifact})\n"
                    f"frames: {len(counts_before)}\n")
            f.write("pre-fusion branch counts are not observable from the "
                    "single fused program\n")
        else:
            f.write(f"mode: {args.mode}\nframes: {len(counts_before)}\n")
            f.write(f"mean detections before fusion/NMS: {np.mean(counts_before):.2f}\n")
        f.write(f"mean detections after fusion/NMS: {np.mean(counts_after):.2f}\n")


if __name__ == "__main__":
    main()
