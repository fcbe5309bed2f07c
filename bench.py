"""Benchmark: end-to-end KITTI frames/sec/chip (BEV raster + KFPN + decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference SFA3D reports 40.2 FPS (README.md:223, BASELINE.md).

Timing method: the tunneled TPU platform in this environment returns from
`jax.block_until_ready` before execution finishes, and every host<->device
fetch pays the tunnel round trip. Iterations are therefore chained through a
scalar data dependency INSIDE jit (forcing serial device execution) and the
chain scalar is fetched once after the loop — wall-clock then reflects real
device time without per-iteration tunnel RTT.
"""

import json
import time

import numpy as np


def build_pipeline(model, K=50):
    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.models import clamped_sigmoid
    from sfa3d_tpu.ops.bev import points_to_bev
    from sfa3d_tpu.ops.decode import decode, detections_to_real, post_processing

    def frame_pipeline(variables, points, valid, feedback):
        pts = points + feedback  # chains iterations; feedback == 0
        bev = jax.vmap(lambda p, v: points_to_bev(p, v))(pts, valid)
        outputs = model.apply(variables, bev, train=False)
        dets = decode(
            clamped_sigmoid(outputs["hm_cen"]),
            clamped_sigmoid(outputs["cen_offset"]),
            outputs["direction"].astype(jnp.float32),
            outputs["z_coor"].astype(jnp.float32),
            outputs["dim"].astype(jnp.float32),
            K=K,
        )
        boxes_bev, mask = post_processing(dets, peak_thresh=0.2)
        boxes_real, mask = detections_to_real(boxes_bev, mask)
        fb = boxes_real[0, 0, 1] * 0.0  # scalar, data-dependent, == 0
        return boxes_real, mask, fb

    return jax.jit(frame_pipeline)


def run_batch(fn, variables, pts, valid, iters):
    import jax.numpy as jnp

    boxes, mask, fb = fn(variables, pts, valid, jnp.float32(0))
    _ = float(fb)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        boxes, mask, fb = fn(variables, pts, valid, fb)
    _ = float(fb)  # one tunnel round trip for the whole chain
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.data.synthetic import synthetic_scene
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.ops.bev import filter_and_pad_points
    from sfa3d_tpu.pipeline import init_detector

    model = create_model("fpn_resnet_18", dtype=jnp.bfloat16)
    variables = init_detector(model, jax.random.PRNGKey(0))
    fn = build_pipeline(model)

    def make_batch(batch):
        n = cnf.MAX_POINTS_FILTERED
        pts = np.zeros((batch, n, 4), np.float32)
        valid = np.zeros((batch, n), bool)
        for b in range(batch):
            scan, _ = synthetic_scene(seed=b)
            p, v = filter_and_pad_points(scan, max_points=n)
            pts[b], valid[b] = p, v
        return jnp.asarray(pts), jnp.asarray(valid)

    best = None
    for batch in (16, 64, 128):
        pts, valid = make_batch(batch)
        iters = max(8, 256 // batch)
        dt = run_batch(fn, variables, pts, valid, iters)
        fps = batch * iters / dt
        # mean over the chained loop (no per-iteration samples exist by design)
        per_frame_ms = dt / iters / batch * 1000.0
        if best is None or fps > best[0]:
            best = (fps, per_frame_ms, batch)

    fps, p50_ms, batch = best
    print(
        json.dumps(
            {
                "metric": "end-to-end KITTI frames/sec/chip (BEV+KFPN+decode)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 40.2, 3),
                "mean_latency_ms_per_frame": round(p50_ms, 3),
                "batch": batch,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
