"""KITTI AP evaluation entry point.

Beyond-reference capability (the reference publishes AP numbers with no
generating code, SURVEY.md section 2.6): run the detector over the val
split and report per-class 3D / BEV AP against the ground-truth labels.
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sfa3d_tpu KITTI AP evaluation")
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--dataset_dir", type=str, default="./dataset/kitti")
    p.add_argument("--split", type=str, default="val", choices=["train", "val"])
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--metric", type=str, default="3d", choices=["3d", "bev"])
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--save_results", type=str, default=None, metavar="DIR",
                   help="also write per-frame KITTI submission-format label "
                        "files (camera-frame rows + score) under DIR")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force a jax platform (the axon plugin ignores "
                        "JAX_PLATFORMS; this uses the config flag, which wins)")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA weights saved by an --ema_decay "
                        "training run instead of the raw weights")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.eval import evaluate_kitti_ap, evaluate_kitti_ap_by_difficulty
    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.pipeline import detect_frames
    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model,
                               use_ema=args.use_ema)

    dataset = KittiDataset(
        args.dataset_dir, mode=args.split, hflip_prob=0.0,
        num_samples=args.num_samples,
    )
    detections, ground_truths = [], []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        out = detect_frames(
            model, variables, sample.points[None], sample.valid[None],
            K=args.K, peak_thresh=args.peak_thresh,
        )
        mask = np.asarray(out["mask"])[0]
        real = np.asarray(out["boxes_real"])[0]
        scores = np.asarray(out["detections"])[0, :, 0]
        det = {
            "boxes": real[mask][:, 1:8],
            "scores": scores[mask],
            "classes": real[mask][:, 0].astype(int),
        }
        if sample.calib is not None:
            # projected 2D bbox heights feed the devkit MIN_HEIGHT
            # detection-ignore rule in the difficulty buckets; detections
            # outside the camera frustum get height 0 (ignored per bucket,
            # like the devkit's out-of-image dets)
            from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image

            b2d, v2d = project_boxes_to_image(
                real, scores, mask,
                np.asarray(sample.calib.V2C, np.float32),
                np.asarray(sample.calib.R0, np.float32),
                np.asarray(sample.calib.P2, np.float32),
                conf_gate=0.0,
            )
            h2d = np.where(np.asarray(v2d), np.asarray(b2d)[:, 3], 0.0)
            det["heights"] = h2d[mask]
        detections.append(det)
        lab = sample.labels[: int(sample.n_labels)]
        # dataset labels store raw velodyne yaw; detector emits the same
        gt = {"boxes": lab[:, 1:8], "classes": lab[:, 0].astype(int)}
        if sample.levels is not None:
            gt["difficulty"] = sample.levels[: int(sample.n_labels)]
        ground_truths.append(gt)
        if args.save_results:
            # KITTI submission-format dump (the shape the official devkit
            # evaluates; the reference publishes AP but writes no results)
            import os

            from sfa3d_tpu.detector import format_detections, write_kitti_results

            write_kitti_results(
                format_detections(
                    {k: np.asarray(out[k])
                     for k in ("mask", "boxes_real", "detections")}, 0
                ),
                sample.calib,
                os.path.join(args.save_results, f"{sample.sample_id:06d}.txt"),
            )
        if (idx + 1) % 50 == 0:
            print(f"{idx + 1}/{len(dataset)} frames")

    results = evaluate_kitti_ap(
        detections, ground_truths, metric=args.metric, with_aos=True
    )
    names = {0: "Pedestrian", 1: "Car", 2: "Cyclist"}
    for cls, name in names.items():
        key = f"AP_{cls}"
        if key in results:
            print(f"AP_{args.metric} {name}: {results[key] * 100:.2f}   "
                  f"AOS: {results[f'AOS_{cls}'] * 100:.2f}")
    print(f"mAP_{args.metric}: {results['mAP'] * 100:.2f}   "
          f"mAOS: {results['mAOS'] * 100:.2f}")

    # Easy/Moderate/Hard table — the reference's published results shape
    # (/root/reference/README.md:223-226)
    table = evaluate_kitti_ap_by_difficulty(
        detections, ground_truths, metric=args.metric
    )
    header = f"{'class':<12}" + "".join(f"{b:>10}" for b in table)
    print(header)
    for cls, name in names.items():
        row = [table[b].get(f"AP_{cls}") for b in table]
        if any(v is not None for v in row):
            cells = "".join(
                f"{(v * 100 if v is not None else float('nan')):>10.2f}" for v in row
            )
            print(f"{name:<12}{cells}")
    print(f"{'mAP':<12}" + "".join(f"{table[b]['mAP'] * 100:>10.2f}" for b in table))
    results["by_difficulty"] = table
    return results


if __name__ == "__main__":
    main()
