"""`python -m sfa3d_tpu.cli export` — AOT-export the detector (or the full
fusion pipeline) to a self-contained StableHLO artifact (runtime/export.py).

Examples:
  # SFA3D detector, symbolic batch, weights baked in:
  python -m sfa3d_tpu.cli export --pretrained_path ckpt_dir -o model.sfa3dx
  # full fusion pipeline at fixed batch 8 for a TPU target:
  python -m sfa3d_tpu.cli export --fused --batch 8 --platforms tpu \
      --yolo_weights yolov8n.pt -o fused.sfa3dx
  # run an artifact (no model code needed beyond the loader):
  python - <<'PY'
  from sfa3d_tpu.runtime.export import load_exported
  art = load_exported("model.sfa3dx")
  out = art.call(points, valid)   # shapes per art.manifest["inputs"]
  PY
"""

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(
        prog="sfa3d_tpu export",
        description="serialize the jitted pipeline to a StableHLO artifact",
    )
    p.add_argument("--pretrained_path", type=str, default=None,
                   help="KFPN checkpoint (.pth or Orbax dir); RANDOM weights "
                        "with a warning if absent")
    p.add_argument("--use_ema", action="store_true",
                   help="bake the EMA weights of an --ema_decay run into "
                        "the artifact")
    p.add_argument("--arch", type=str, default="fpn_resnet_18")
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--batch", type=int, default=None,
                   help="fixed batch size; default: symbolic (any batch)")
    p.add_argument("--max_points", type=int, default=None,
                   help="per-scan point budget baked into the artifact "
                        "(default: MAX_POINTS_FILTERED=32768, the "
                        "host-filtered budget every serving path pads to; "
                        "pass MAX_POINTS=65536 only if you will feed raw "
                        "UNFILTERED clouds — doubles H2D and raster cost)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list of lowering platforms, e.g. tpu or "
                        "tpu,cpu; default: the current jax backend")
    p.add_argument("--fused", action="store_true",
                   help="export the FULL fusion pipeline "
                        "(SFA3D+YOLOv8n+Bayesian fusion+Gaussian NMS)")
    p.add_argument("--yolo_weights", type=str, default=None,
                   help="ultralytics yolov8n .pt for --fused")
    p.add_argument("--img_hw", type=int, nargs=2, default=(375, 1242),
                   metavar=("H", "W"),
                   help="camera frame size baked into a fused artifact's "
                        "letterbox geometry (default: KITTI 375 1242)")
    p.add_argument("--letterbox", type=int, default=640,
                   help="YOLO input size baked into a fused artifact "
                        "(stride-32 multiple)")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force the local jax backend used to trace/export")
    p.add_argument("-o", "--out", type=str, required=True)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from sfa3d_tpu.models import create_model, load_variables
    from sfa3d_tpu.runtime.export import (
        export_detector, export_fused, save_exported,
    )

    import sfa3d_tpu.config.kitti as cnf

    platforms = args.platforms.split(",") if args.platforms else None
    max_points = args.max_points or cnf.MAX_POINTS_FILTERED
    model = create_model(args.arch)
    variables = load_variables(args.pretrained_path, args.arch, model=model,
                               use_ema=args.use_ema)

    if args.fused:
        from sfa3d_tpu.models.yolov8 import YOLOv8, load_yolo_variables

        yolo_vars = load_yolo_variables(args.yolo_weights)
        if yolo_vars is None:
            import jax.numpy as jnp

            yolo = YOLOv8(scale="n")
            yolo_vars = yolo.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, args.letterbox, args.letterbox, 3), jnp.float32),
            )
        else:
            # size the module from the checkpoint's own shapes (stock
            # COCO-80 .pt or the framework's 3-class trained export)
            nc = yolo_vars["params"]["detect"]["cv3_0_2"]["bias"].shape[0]
            stem_w = yolo_vars["params"]["stem"]["conv"]["kernel"].shape[-1]
            scale = {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}[int(stem_w)]
            yolo = YOLOv8(scale=scale, num_classes=int(nc))
        exported, manifest = export_fused(
            model, variables, yolo, yolo_vars,
            batch=args.batch, platforms=platforms, max_points=max_points,
            img_hw=tuple(args.img_hw), letterbox=args.letterbox,
        )
    else:
        exported, manifest = export_detector(
            model, variables, K=args.K, peak_thresh=args.peak_thresh,
            batch=args.batch, platforms=platforms, max_points=max_points,
        )

    save_exported(args.out, exported, manifest)
    size = os.path.getsize(args.out)
    print(f"wrote {args.out}: kind={manifest['kind']} "
          f"platforms={manifest['platforms']} batch="
          f"{args.batch if args.batch else 'symbolic'} ({size/1e6:.1f} MB)")
    return manifest


if __name__ == "__main__":
    main()
