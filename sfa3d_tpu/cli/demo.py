"""Raw-drive video demo: front-only and front+back (two-pass flipped BEV).

Parity with reference demo_front.py / demo_2_sides.py + utils/demo_utils.py:
iterate a KITTI raw drive (image_02/data + velodyne_points/data), run the
detector on the front BEV, and for --two_sides also on the rear BEV produced
with the mirrored boundary and a W-flip (demo_utils.py:109-127,
demo_2_sides.py:58-77), composing an RGB + front/back BEV video.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu demo (demo_front/demo_2_sides parity)")
    p.add_argument("--saved_fn", type=str, default="fpn_resnet_18")
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA weights of an --ema_decay run")
    p.add_argument("--drive_dir", type=str, required=True,
                   help="KITTI raw drive folder containing image_02/ and velodyne_points/")
    p.add_argument("--two_sides", action="store_true")
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--output-width", dest="output_width", type=int, default=608)
    return p.parse_args(argv)


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.data.kitti import DemoKittiDataset
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.ops.bev import points_to_bev
    from sfa3d_tpu.viz.draw import (
        bev_map_to_image,
        draw_predictions_bev,
        merge_rgb_to_bev,
        write_credit,
    )

    args = parse_args(argv)
    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)

    dataset = DemoKittiDataset(args.drive_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    video_writer = None

    back_bound = tuple(
        cnf.boundary_back[k] for k in ("minX", "maxX", "minY", "maxY", "minZ", "maxZ")
    )

    for idx in range(len(dataset)):
        points, valid, img_path = dataset[idx]
        t0 = time.time()
        front_bev = points_to_bev(jnp.asarray(points), jnp.asarray(valid))
        dets_front, _ = _detect_boxes(model, variables, front_bev, args)
        panels = [_draw_panel(front_bev, dets_front)]

        if args.two_sides:
            back_bev = points_to_bev(
                jnp.asarray(points), jnp.asarray(valid), bound=back_bound
            )
            # rear view is detected on the H+W-mirrored raster (reference
            # do_detect flips both axes, demo_utils.py:110: flip(bev, [1, 2]))
            back_bev = back_bev[::-1, ::-1, :]
            dets_back, _ = _detect_boxes(model, variables, back_bev, args)
            panels.append(cv2.rotate(_draw_panel(back_bev, dets_back), cv2.ROTATE_180))

        fps = 1.0 / max(time.time() - t0, 1e-9)
        img_rgb = cv2.imread(img_path)
        if img_rgb is None:
            img_rgb = np.zeros((375, 1242, 3), np.uint8)
        bev_panel = cv2.vconcat(panels) if len(panels) > 1 else panels[0]
        out_img = merge_rgb_to_bev(img_rgb, bev_panel, output_width=args.output_width)
        # credit + FPS overlay (demo_utils.py:130-137; call sites
        # demo_front.py:81 / demo_2_sides.py:89 — positions scaled to our
        # output width so the text stays on-frame)
        y = min(210, out_img.shape[0] - 20)
        write_credit(out_img, org_author=(10, y),
                     text_author="Cre: github.com/maudzung",
                     org_fps=(10, min(y + 40, out_img.shape[0] - 5)), fps=fps)

        if video_writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            video_writer = cv2.VideoWriter(
                os.path.join(args.output_dir, f"demo_{args.saved_fn}.avi"),
                fourcc, 30, (out_img.shape[1], out_img.shape[0]),
            )
        video_writer.write(out_img)
        print(f"frame {idx}: {fps:.1f} FPS")
    if video_writer is not None:
        video_writer.release()


def _detect_boxes(model, variables, bev, args):
    """ONE inference pass; returns BEV-pixel boxes for drawing + metric boxes."""
    import numpy as np

    from sfa3d_tpu.pipeline import detect_bev

    _, boxes_bev, real, mask = detect_bev(
        model, variables, bev[None], K=args.K, peak_thresh=args.peak_thresh
    )
    return (np.asarray(boxes_bev)[0], np.asarray(mask)[0]), np.asarray(real)[0]


def _draw_panel(bev, dets):
    import cv2

    import numpy as np

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.viz.draw import bev_map_to_image, draw_predictions_bev

    boxes_bev, mask = dets
    img = bev_map_to_image(np.asarray(bev))
    img = cv2.resize(img, (cnf.BEV_WIDTH, cnf.BEV_HEIGHT))
    draw_predictions_bev(img, boxes_bev, mask)
    return cv2.rotate(img, cv2.ROTATE_180)


if __name__ == "__main__":
    main()
