"""Inference + visualization entry point.

Parity with reference test.py:31-225 and the test2.py KFPN-introspection
extension (--enable_kfpn_viz): iterate the test split, run the jit frame
pipeline, draw BEV + RGB composites, save images/video. Interactive cv2
windows are replaced by --output_dir file dumps (headless-friendly); pass
--show to get the cv2.imshow loop when a display exists.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu testing (reference test.py parity)")
    p.add_argument("--saved_fn", type=str, default="fpn_resnet_18", metavar="FN")
    p.add_argument("--arch", type=str, default="fpn_resnet_18", metavar="ARCH")
    p.add_argument("--pretrained_path", type=str, default=None, metavar="PATH")
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA weights of an --ema_decay run")
    p.add_argument("--dataset_dir", type=str, default="./dataset/kitti")
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--save_test_output", action="store_true")
    p.add_argument("--output_format", type=str, default="image", choices=["image", "video"])
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--output-width", dest="output_width", type=int, default=608)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--enable_kfpn_viz", action="store_true")
    p.add_argument("--show", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.geometry.calibration import KittiCalibration
    from sfa3d_tpu.geometry.transforms import lidar_to_camera_box
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.pipeline import detect_frames
    from sfa3d_tpu.viz.draw import (
        bev_map_to_image,
        draw_predictions_bev,
        merge_rgb_to_bev,
        show_rgb_image_with_boxes,
    )

    args = parse_args(argv)
    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)

    dataset = KittiDataset(args.dataset_dir, mode="test", num_samples=args.num_samples)
    os.makedirs(args.output_dir, exist_ok=True)
    video_writer = None

    for idx in range(len(dataset)):
        sample = dataset[idx]
        t0 = time.time()
        out = detect_frames(
            model, variables, sample.points[None], sample.valid[None],
            K=args.K, peak_thresh=args.peak_thresh,
            return_heads=bool(args.save_test_output),
        )
        # fetch forces completion; this is the whole-frame latency
        boxes_bev = np.asarray(out["boxes_bev"])[0]
        boxes_real = np.asarray(out["boxes_real"])[0]
        mask = np.asarray(out["mask"])[0]
        bev = np.asarray(out["bev"])[0]
        dt = time.time() - t0
        print(f"frame {sample.sample_id}: {mask.sum()} dets, "
              f"{dt * 1000:.1f} ms ({1.0 / max(dt, 1e-9):.1f} FPS)")

        bev_img = bev_map_to_image(bev)
        bev_img = cv2.resize(bev_img, (cnf.BEV_WIDTH, cnf.BEV_HEIGHT))
        draw_predictions_bev(bev_img, boxes_bev, mask)
        bev_img = cv2.rotate(bev_img, cv2.ROTATE_180)

        img_rgb = cv2.imread(sample.img_path)
        if img_rgb is None:  # no camera image in the fixture
            img_rgb = np.zeros((375, 1242, 3), np.uint8)
        calib_path = sample.img_path.replace(".png", ".txt").replace("image_2", "calib")
        calib = KittiCalibration(calib_path if os.path.isfile(calib_path) else None)
        if mask.any():
            cam = np.asarray(
                lidar_to_camera_box(boxes_real[mask][:, 1:8], calib.V2C, calib.R0, calib.P2)
            )
            cam_labels = np.concatenate([boxes_real[mask][:, :1], cam], axis=1)
            img_rgb = show_rgb_image_with_boxes(img_rgb, cam_labels, calib)
        out_img = merge_rgb_to_bev(img_rgb, bev_img, output_width=args.output_width)

        if args.enable_kfpn_viz:
            from sfa3d_tpu.viz.kfpn_viz import save_all

            _, viz = model.apply(
                variables, jnp.asarray(bev[None]), train=False, capture_features=True
            )
            save_all(viz, os.path.join(args.output_dir, f"kfpn_viz_{sample.sample_id:06d}"))

        if args.save_test_output:
            # staged per-class heatmap dumps (reference test.py:126-166):
            # raw BEV, pre-sigmoid and post-sigmoid center heatmaps per class
            from sfa3d_tpu.models import clamped_sigmoid

            viz_dir = os.path.join(args.output_dir, "visualizations")
            os.makedirs(viz_dir, exist_ok=True)
            cv2.imwrite(
                os.path.join(viz_dir, f"{sample.sample_id:06d}_raw_bev.jpg"),
                cv2.resize(bev_map_to_image(bev), (cnf.BEV_WIDTH, cnf.BEV_HEIGHT)),
            )
            # head tensors come from the SAME forward as the detections
            # (return_heads above) — no second model.apply
            heads = out["heads"]
            hm_raw = np.asarray(heads["hm_cen"].astype(jnp.float32))[0]  # (H, W, C)
            hm_sig = np.asarray(clamped_sigmoid(heads["hm_cen"]))[0]
            for cls_id in range(hm_raw.shape[-1]):
                for tag, hm in (("raw", hm_raw), ("sigmoid", hm_sig)):
                    heat = (np.clip(hm[..., cls_id], 0, 1) * 255).astype(np.uint8)
                    cv2.imwrite(
                        os.path.join(
                            viz_dir,
                            f"{sample.sample_id:06d}_{tag}_heatmap_cls{cls_id}.jpg",
                        ),
                        cv2.applyColorMap(heat, cv2.COLORMAP_JET),
                    )

        if args.save_test_output or not args.show:
            if args.output_format == "image":
                cv2.imwrite(
                    os.path.join(args.output_dir, f"{sample.sample_id:06d}.jpg"), out_img
                )
            else:
                if video_writer is None:
                    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
                    video_writer = cv2.VideoWriter(
                        os.path.join(args.output_dir, f"{args.saved_fn}.avi"),
                        fourcc, 30, (out_img.shape[1], out_img.shape[0]),
                    )
                video_writer.write(out_img)
        if args.show:
            cv2.imshow("test-img", out_img)
            if cv2.waitKey(0) & 0xFF == 27:
                break
    if video_writer is not None:
        video_writer.release()


if __name__ == "__main__":
    main()
