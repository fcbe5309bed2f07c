"""Benchmark: end-to-end KITTI frames/sec/chip (BEV raster + KFPN + decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference SFA3D reports 40.2 FPS (README.md:223, BASELINE.md).

Timing method: the tunneled TPU platform in this environment returns from
`jax.block_until_ready` before execution finishes, so each iteration is
chained through a data dependency on the previous output and a single scalar
is fetched at the end — wall-clock then reflects real device time.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.data.synthetic import synthetic_batch_points
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.models import clamped_sigmoid
    from sfa3d_tpu.ops.bev import points_to_bev
    from sfa3d_tpu.ops.decode import decode, detections_to_real, post_processing

    BATCH = 8
    K = 50

    model = create_model("fpn_resnet_18", dtype=jnp.bfloat16)
    variables = init_detector(model, jax.random.PRNGKey(0))

    def frame_pipeline(variables, points, valid, feedback):
        # `feedback` chains iterations (see module docstring): it is ~0 and
        # perturbs the input so XLA cannot elide or overlap iterations.
        pts = points + feedback
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

    fn = jax.jit(frame_pipeline)

    pts, valid = synthetic_batch_points(BATCH, seed=0)
    pts = jnp.asarray(pts)
    valid = jnp.asarray(valid)

    # warmup / compile
    boxes, mask, fb = fn(variables, pts, valid, jnp.float32(0))
    _ = float(fb)

    iters = 30
    lat = []
    t_all = time.perf_counter()
    for _ in range(iters):
        t0 = time.perf_counter()
        boxes, mask, fb = fn(variables, pts, valid, fb)
        _ = float(fb)  # forces the chained iteration to completion
        lat.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_all

    frames = BATCH * iters
    fps = frames / total
    p50_ms = float(np.percentile(np.asarray(lat) / BATCH, 50) * 1000.0)

    print(
        json.dumps(
            {
                "metric": "end-to-end KITTI frames/sec/chip (BEV+KFPN+decode)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 40.2, 3),
                "p50_latency_ms_per_frame": round(p50_ms, 3),
                "batch": BATCH,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
