"""3D multi-object tracking demo over a KITTI raw drive.

BEYOND the reference (its demos re-detect every frame with no identity —
demo_2_sides.py, utils/demo_utils.py:109-127): runs the detector per frame
and feeds the metric boxes through the fixed-slot Kalman tracker
(sfa3d_tpu/tracking/), drawing stable track ids + velocity vectors on the
BEV panel and writing the composite video the demo writes.

    python -m sfa3d_tpu.cli track --drive_dir <kitti_raw_drive> \
        --pretrained_path <ckpt> [--max_age 3] [--min_hits 2]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu 3D MOT demo")
    p.add_argument("--saved_fn", type=str, default="fpn_resnet_18")
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA weights of an --ema_decay run")
    p.add_argument("--drive_dir", type=str, required=True,
                   help="KITTI raw drive folder (image_02/ + velodyne_points/)")
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--max_tracks", type=int, default=64)
    p.add_argument("--iou_min", type=float, default=0.01)
    p.add_argument("--max_age", type=int, default=3)
    p.add_argument("--min_hits", type=int, default=2)
    p.add_argument("--show_coasting", action="store_true",
                   help="also draw unconfirmed/coasting tracks (dashed id)")
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--output-width", dest="output_width", type=int, default=608)
    return p.parse_args(argv)


def metric_to_bev_px(box):
    """[cls, x, y, z, h, w, l, yaw] metric velodyne row -> BEV-pixel
    (x_px, y_px, w_px, l_px, yaw_px) — the inverse of
    ops/decode.detections_to_real."""
    from sfa3d_tpu.config import kitti as cnf

    _, x, y, _z, _h, w, l, yaw = box
    x_px = (y - cnf.boundary["minY"]) / cnf.bound_size_y * cnf.BEV_WIDTH
    y_px = (x - cnf.boundary["minX"]) / cnf.bound_size_x * cnf.BEV_HEIGHT
    w_px = w / cnf.bound_size_y * cnf.BEV_WIDTH
    l_px = l / cnf.bound_size_x * cnf.BEV_HEIGHT
    return x_px, y_px, w_px, l_px, -yaw


def draw_tracks_bev(img, out, show_coasting=False):
    """Draw confirmed tracks: rotated box, id label, velocity vector."""
    import cv2

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.viz.draw import draw_rotated_box

    which = out["alive"] if show_coasting else out["confirmed"]
    for t in np.nonzero(np.asarray(which))[0]:
        box = np.asarray(out["boxes"][t])
        tid = int(out["ids"][t])
        confirmed = bool(out["confirmed"][t])
        x_px, y_px, w_px, l_px, yaw_px = metric_to_bev_px(box)
        color = cnf.colors[int(box[0]) % len(cnf.colors)]
        draw_rotated_box(img, x_px, y_px, w_px, l_px, yaw_px, color)
        vx, vy = np.asarray(out["velocities"][t][:2])
        # velocity in metric m/frame -> BEV px (x_metric -> rows, y -> cols)
        tip = (
            int(x_px + vy / cnf.bound_size_y * cnf.BEV_WIDTH * 5),
            int(y_px + vx / cnf.bound_size_x * cnf.BEV_HEIGHT * 5),
        )
        cv2.arrowedLine(img, (int(x_px), int(y_px)), tip, color, 1,
                        tipLength=0.3)
        label = f"#{tid}" if confirmed else f"({tid})"
        cv2.putText(img, label, (int(x_px) + 3, int(y_px) - 3),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1, cv2.LINE_AA)


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.data.kitti import DemoKittiDataset
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.ops.bev import points_to_bev
    from sfa3d_tpu.pipeline import detect_bev
    from sfa3d_tpu.tracking import init_tracks, tracker_step
    from sfa3d_tpu.viz.draw import bev_map_to_image, merge_rgb_to_bev

    args = parse_args(argv)
    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)
    dataset = DemoKittiDataset(args.drive_dir)
    os.makedirs(args.output_dir, exist_ok=True)

    state = init_tracks(args.max_tracks)
    video_writer = None
    seen_ids = set()
    for idx in range(len(dataset)):
        points, valid, img_path = dataset[idx]
        bev = points_to_bev(jnp.asarray(points), jnp.asarray(valid))
        dets, _, boxes_real, mask = detect_bev(
            model, variables, bev[None], K=args.K, peak_thresh=args.peak_thresh
        )
        state, out = tracker_step(
            state, boxes_real[0], dets[0, :, 0], mask[0],
            iou_min=args.iou_min, max_age=args.max_age, min_hits=args.min_hits,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        seen_ids.update(out["ids"][out["confirmed"]].tolist())

        img = bev_map_to_image(np.asarray(bev))
        img = cv2.resize(img, (cnf.BEV_WIDTH, cnf.BEV_HEIGHT))
        draw_tracks_bev(img, out, show_coasting=args.show_coasting)
        img = cv2.rotate(img, cv2.ROTATE_180)
        img_rgb = cv2.imread(img_path)
        if img_rgb is None:
            img_rgb = np.zeros((375, 1242, 3), np.uint8)
        out_img = merge_rgb_to_bev(img_rgb, img, output_width=args.output_width)

        if video_writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            video_writer = cv2.VideoWriter(
                os.path.join(args.output_dir, f"track_{args.saved_fn}.avi"),
                fourcc, 30, (out_img.shape[1], out_img.shape[0]),
            )
        video_writer.write(out_img)
        n_conf = int(out["confirmed"].sum())
        print(f"frame {idx}: {n_conf} confirmed track(s), "
              f"{int(out['alive'].sum())} alive")
    if video_writer is not None:
        video_writer.release()
    print(f"done: {len(seen_ids)} distinct confirmed track id(s) over "
          f"{len(dataset)} frames")


if __name__ == "__main__":
    main()
