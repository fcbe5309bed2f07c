"""Per-stage throughput breakdown on the local chip.

Times each stage of the fused pipeline in isolation with the chained-scalar
method (bench.py): BEV raster, KFPN forward, decode+post, YOLOv8n forward,
YOLO decode+NMS, fusion math. Use to find the next optimization target.

  python scripts/bench_breakdown.py [--batch 128] [--s2d] [--mfu]

--mfu adds XLA-counted FLOPs per stage and prints achieved TFLOP/s vs the
v5e peak (197 bf16 TFLOP/s; f32 runs at the bf16 multiply rate under the
default precision). --s2d benches the space-to-depth stem reformulation
(models.resnet.stem_kernel_to_s2d).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained(fn, init_args, feedback_of, iters):
    """fn(*args, fb) -> out; feedback_of(out) -> 0-scalar."""
    import jax.numpy as jnp

    out = fn(*init_args, jnp.float32(0))
    fb = feedback_of(out)
    _ = float(fb)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*init_args, fb)
        fb = feedback_of(out)
    _ = float(fb)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem reformulation")
    ap.add_argument("--fused_heads", action="store_true",
                    help="fused head towers (one wide conv pair per level; "
                         "exactly weight-transformable, bit-exact)")
    ap.add_argument("--mfu", action="store_true",
                    help="XLA-counted FLOPs + achieved TFLOP/s per stage")
    ap.add_argument("--img_hw", type=int, nargs=2, default=[640, 640],
                    metavar=("H", "W"),
                    help="camera-branch canvas (rows cols); the reference's "
                         "predict-mode letterbox of a 1242x375 KITTI frame "
                         "at imgsz 640 is 224 640 (bench.py headline)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.models import clamped_sigmoid, create_model
    from sfa3d_tpu.models.yolov8 import YOLOv8, decode_predictions, select_detections
    from sfa3d_tpu.ops.bev import points_to_bev
    from sfa3d_tpu.ops.decode import decode, detections_to_real, post_processing
    from sfa3d_tpu.pipeline import init_detector
    from bench import make_points

    b = args.batch
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kfpn = create_model("fpn_resnet_18", dtype=dt, s2d_stem=args.s2d,
                        fused_heads=args.fused_heads)
    kvars = init_detector(kfpn, jax.random.PRNGKey(0))
    ih, iw = args.img_hw
    yolo = YOLOv8(scale="n", dtype=dt)
    yvars = yolo.init(jax.random.PRNGKey(1), jnp.zeros((1, ih, iw, 3)), train=False)

    pts, valid = make_points(b)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (b, ih, iw, 3)).astype(np.float32))

    timings = {}

    # 1. BEV raster
    @jax.jit
    def raster(pts, valid, fb):
        bev = jax.vmap(lambda p, v: points_to_bev(p, v))(pts + fb, valid)
        return bev

    dt = chained(raster, (pts, valid), lambda bev: bev[0, 0, 0, 0] * 0.0, args.iters)
    timings["bev_raster"] = dt
    bev0 = raster(pts, valid, jnp.float32(0))

    # 2. KFPN forward
    @jax.jit
    def kfwd(bev, fb):
        outs = kfpn.apply(kvars, bev + fb, train=False)
        return outs

    dt = chained(kfwd, (bev0,), lambda o: o["hm_cen"].astype(jnp.float32)[0, 0, 0, 0] * 0.0, args.iters)
    timings["kfpn_forward"] = dt
    outs0 = kfwd(bev0, jnp.float32(0))

    # 3. decode + post + to-real
    @jax.jit
    def dec(outs, fb):
        dets = decode(
            clamped_sigmoid(outs["hm_cen"]) + fb,
            clamped_sigmoid(outs["cen_offset"]),
            outs["direction"].astype(jnp.float32),
            outs["z_coor"].astype(jnp.float32),
            outs["dim"].astype(jnp.float32),
            K=50,
        )
        boxes_bev, mask = post_processing(dets, peak_thresh=0.2)
        boxes_real, mask = detections_to_real(boxes_bev, mask)
        return boxes_real

    dt = chained(dec, (outs0,), lambda r: r[0, 0, 1] * 0.0, args.iters)
    timings["sfa_decode"] = dt

    # 4. YOLO forward
    @jax.jit
    def yfwd(img, fb):
        return yolo.apply(yvars, img + fb, train=False)

    dt = chained(
        yfwd, (images,), lambda o: o[0][0].astype(jnp.float32)[0, 0, 0, 0] * 0.0,
        args.iters,
    )
    timings["yolo_forward"] = dt
    youts0 = yfwd(images, jnp.float32(0))

    # 5. YOLO decode + NMS
    @jax.jit
    def ydec(youts, fb):
        boxes, scores = decode_predictions(youts)
        sel = jax.vmap(
            lambda bb, ss: select_detections(bb, ss + fb, max_det=50)
        )(boxes, scores)
        return sel

    dt = chained(ydec, (youts0,), lambda s: s[1][0, 0] * 0.0, args.iters)
    timings["yolo_decode_nms"] = dt

    per_frame = {k: v / args.iters / b * 1000.0 for k, v in timings.items()}
    total = sum(per_frame.values())
    out = {
        "batch": b,
        "dtype": args.dtype,
        "s2d_stem": args.s2d,
        "img_hw": [ih, iw],
        "per_frame_ms": {k: round(v, 4) for k, v in per_frame.items()},
        "sum_ms": round(total, 4),
        "sum_fps": round(1000.0 / total, 1),
        "device": str(jax.devices()[0]),
    }

    if args.mfu:
        # XLA's own FLOP count per compiled stage program
        def stage_flops(fn, *a):
            ca = fn.lower(*a, jnp.float32(0)).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        PEAK_TFLOPS = 197.0  # TPU v5e bf16 peak per chip
        flops = {
            "bev_raster": stage_flops(raster, pts, valid),
            "kfpn_forward": stage_flops(kfwd, bev0),
            "sfa_decode": stage_flops(dec, outs0),
            "yolo_forward": stage_flops(yfwd, images),
            "yolo_decode_nms": stage_flops(ydec, youts0),
        }
        mfu = {}
        for k, fl in flops.items():
            ms = per_frame[k]
            per_frame_flops = fl / b
            achieved = per_frame_flops / (ms / 1e3) / 1e12  # TFLOP/s
            mfu[k] = {
                "gflops_per_frame": round(per_frame_flops / 1e9, 3),
                "achieved_tflops": round(achieved, 2),
                "mfu_pct_of_v5e_peak": round(100 * achieved / PEAK_TFLOPS, 2),
            }
        out["mfu"] = mfu
        out["total_gflops_per_frame"] = round(sum(f / b for f in flops.values()) / 1e9, 3)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
