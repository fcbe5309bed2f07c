"""Argoverse pipeline runner.

Parity with reference argoverse_test.py / argoverse_test2.py /
argo_sfa_test.py: iterate paired lidar+camera Argoverse frames, build the
Argoverse BEV raster on device, run the KFPN detector, convert grid
detections to metric ego-frame boxes, project ground-truth 3D boxes into the
image via the JSON SE3 calibration, and save composite outputs. Per-frame
try/except resilience follows argo_sfa_test.py:219-383. (The reference's
argo_sfa_test.py is broken as committed — imports that don't exist,
SURVEY.md section 2.3; this runner is the working equivalent.)
"""

from __future__ import annotations

import argparse
import os
import traceback

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu Argoverse runner")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA weights of an --ema_decay run")
    p.add_argument("--target_camera", type=str, default="ring_front_center")
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--output_dir", type=str, default="./results/argoverse")
    return p.parse_args(argv)


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    from sfa3d_tpu.data.argoverse import ArgoverseDataset
    from sfa3d_tpu.geometry.transforms import center_to_corner_box3d
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.ops.bev import argoverse_points_to_bev
    from sfa3d_tpu.pipeline import detect_bev

    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)

    dataset = ArgoverseDataset(
        args.dataset_dir, mode="test",
        target_camera=args.target_camera, num_samples=args.num_samples,
    )
    print(f"Loaded {len(dataset)} Argoverse samples")

    for idx in range(len(dataset)):
        try:
            sample = dataset[idx]
            bev = argoverse_points_to_bev(
                jnp.asarray(sample.points), jnp.asarray(sample.valid)
            )
            # detector input: 608x608 crop of the (1000,1000) raster center
            h, w = bev.shape[:2]
            y0, x0 = (h - 608) // 2, (w - 608) // 2
            bev_crop = bev[y0 : y0 + 608, x0 : x0 + 608, :] / 255.0
            dets, _bev_boxes, real, mask = detect_bev(
                model, variables, bev_crop[None], K=50, peak_thresh=args.peak_thresh
            )
            n_det = int(np.asarray(mask).sum())

            # draw GT boxes projected into the camera image
            img = cv2.imread(sample.img_path)
            if img is None:
                img = np.zeros((1200, 1920, 3), np.uint8)
            if sample.calib is not None and int(sample.n_labels):
                labels = sample.labels[: int(sample.n_labels)]
                corners = np.asarray(center_to_corner_box3d(labels[:, 1:8]))
                for box_corners in corners:
                    uv, valid = sample.calib.project_ego_to_image(box_corners)
                    if valid.all():
                        pts = uv.astype(int)
                        for a, b in [
                            (0, 1), (1, 2), (2, 3), (3, 0),
                            (4, 5), (5, 6), (6, 7), (7, 4),
                            (0, 4), (1, 5), (2, 6), (3, 7),
                        ]:
                            cv2.line(img, tuple(pts[a]), tuple(pts[b]), (0, 255, 0), 2)

            bev_u8 = np.asarray(bev).astype(np.uint8)
            cv2.imwrite(
                os.path.join(args.output_dir, f"{sample.timestamp}_bev.jpg"), bev_u8
            )
            cv2.imwrite(
                os.path.join(args.output_dir, f"{sample.timestamp}_rgb.jpg"), img
            )
            print(f"frame {sample.timestamp}: {n_det} detections, "
                  f"{int(sample.n_labels)} GT boxes")
        except Exception:
            # per-frame resilience (argo_sfa_test.py:219-383)
            print(f"frame {idx} failed:")
            traceback.print_exc()
            continue


if __name__ == "__main__":
    main()
