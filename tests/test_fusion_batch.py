"""The batched all-on-device fusion pipeline (fusion/batch.py) must agree
frame-for-frame with the host orchestration path (fusion/pipeline.fuse_frame),
which is itself oracle-tested against the reference's test5/test6 semantics
(tests/test_fusion.py). Chain: reference -> fuse_frame oracle -> batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfa3d_tpu.config import kitti as cnf
from sfa3d_tpu.data.synthetic import synthetic_scene
from sfa3d_tpu.fusion.batch import build_fused_pipeline
from sfa3d_tpu.fusion.pipeline import fuse_frame
from sfa3d_tpu.geometry.calibration import KittiCalibration
from sfa3d_tpu.models import create_model
from sfa3d_tpu.models.yolov8 import YOLOv8, decode_predictions, select_detections
from sfa3d_tpu.ops.bev import filter_and_pad_points
from sfa3d_tpu.pipeline import detect_frames, init_detector

IMG = 64  # letterboxed camera size (stride-32 multiple)
MAX_YOLO = 8
K = 50


def _models_and_inputs(rng):
    kfpn = create_model("fpn_resnet_18")
    kvars = init_detector(kfpn, jax.random.PRNGKey(0))
    # push the heatmap head bias up so random weights produce detections
    kvars = jax.tree_util.tree_map(lambda t: np.array(t), kvars)
    for idx in range(3):
        kvars["params"][f"fpn{idx}_hm_cen"]["conv2"]["bias"] += 2.0

    yolo = YOLOv8(scale="n")
    yvars = yolo.init(
        jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        train=False,
    )

    B = 2
    pts = np.zeros((B, cnf.MAX_POINTS_FILTERED, 4), np.float32)
    val = np.zeros((B, cnf.MAX_POINTS_FILTERED), bool)
    for b in range(B):
        scan, _ = synthetic_scene(seed=b + 3)
        pts[b], val[b] = filter_and_pad_points(
            scan, max_points=cnf.MAX_POINTS_FILTERED
        )
    images = rng.uniform(0, 1, (B, IMG, IMG, 3)).astype(np.float32)

    calib = KittiCalibration(None)
    V2C = np.tile(calib.V2C.astype(np.float32)[None], (B, 1, 1))
    R0 = np.tile(calib.R0.astype(np.float32)[None], (B, 1, 1))
    P2 = np.tile(calib.P2.astype(np.float32)[None], (B, 1, 1))
    img_hw = np.tile(np.asarray([IMG, IMG], np.float32)[None], (B, 1))
    lb_scale = np.ones((B,), np.float32)
    lb_pad = np.zeros((B, 2), np.float32)
    return (kfpn, kvars, yolo, yvars,
            pts, val, images, V2C, R0, P2, img_hw, lb_scale, lb_pad, calib)


@pytest.mark.parametrize("mode,use_gnms", [("bayesian", True), ("weighted", False)])
def test_batched_fusion_matches_host_path(rng, mode, use_gnms):
    (kfpn, kvars, yolo, yvars, pts, val, images, V2C, R0, P2,
     img_hw, lb_scale, lb_pad, calib) = _models_and_inputs(rng)

    kw = dict(
        peak_thresh=0.2, sfa_conf_gate=0.2, yolo_conf=0.25, yolo_iou=0.45,
        confidence_threshold=0.25, fusion_iou_threshold=0.7,
        nms_threshold=0.5, gaussian_sigma=0.5,
    )
    run = build_fused_pipeline(
        kfpn, yolo, K=K, max_yolo=MAX_YOLO, mode=mode,
        use_gaussian_nms=use_gnms, **kw,
    )
    out = run(kvars, yvars, jnp.asarray(pts), jnp.asarray(val),
              jnp.asarray(images), V2C, R0, P2, img_hw, lb_scale, lb_pad)
    out = jax.tree_util.tree_map(np.asarray, out)

    # host path, frame by frame
    sfa = detect_frames(kfpn, kvars, jnp.asarray(pts), jnp.asarray(val),
                        K=K, peak_thresh=0.2)
    youts = yolo.apply(yvars, jnp.asarray(images), train=False)
    yb_all, ys_all = decode_predictions(youts)

    any_valid = False
    for b in range(pts.shape[0]):
        byb, bys, byc, byv = select_detections(
            yb_all[b], ys_all[b], conf_thresh=0.25, iou_thresh=0.45,
            max_det=MAX_YOLO,
        )
        byb, bys, byc, byv = map(np.asarray, (byb, bys, byc, byv))
        keep = byv & (bys >= 0.25)
        # same int-truncated original-pixel xywh the detector facade emits
        b_xywh = [
            [int(x1), int(y1), int(x2) - int(x1), int(y2) - int(y1)]
            for x1, y1, x2, y2 in np.clip(byb[keep], 0, IMG)
        ]
        host = fuse_frame(
            b_xywh, bys[keep], byc[keep],
            np.asarray(sfa["boxes_real"])[b],
            np.asarray(sfa["boxes_bev"])[b, :, 1],
            np.asarray(sfa["mask"])[b],
            calib, (IMG, IMG),
            mode=mode,
            confidence_threshold=kw["confidence_threshold"],
            fusion_iou_threshold=kw["fusion_iou_threshold"],
            nms_threshold=kw["nms_threshold"],
            use_gaussian_nms=use_gnms,
            gaussian_sigma=kw["gaussian_sigma"],
            sfa_conf_gate=kw["sfa_conf_gate"],
            max_yolo=MAX_YOLO,
        )
        v = out["valid"][b]
        got = np.concatenate(
            [out["boxes"][b][v], out["scores"][b][v][:, None],
             out["classes"][b][v][:, None], out["source"][b][v][:, None]],
            axis=1,
        )
        want = np.concatenate(
            [host["boxes"], host["scores"][:, None],
             host["classes"][:, None], host["source"][:, None]],
            axis=1,
        )
        assert got.shape == want.shape
        order = lambda a: a[np.lexsort((a[:, 1], a[:, 0]))]
        np.testing.assert_allclose(order(got), order(want), atol=1e-4)
        any_valid = any_valid or v.any()
    assert any_valid, "fixture produced no fused detections — test is vacuous"


def test_batched_fusion_3d_outputs_consistent(rng):
    """boxes_real/mask_3d from the fused program must equal the standalone
    SFA3D pipeline (the fusion stages must not perturb the 3D branch)."""
    (kfpn, kvars, yolo, yvars, pts, val, images, V2C, R0, P2,
     img_hw, lb_scale, lb_pad, _) = _models_and_inputs(rng)
    run = build_fused_pipeline(kfpn, yolo, K=K, max_yolo=MAX_YOLO)
    out = run(kvars, yvars, jnp.asarray(pts), jnp.asarray(val),
              jnp.asarray(images), V2C, R0, P2, img_hw, lb_scale, lb_pad)
    sfa = detect_frames(kfpn, kvars, jnp.asarray(pts), jnp.asarray(val),
                        K=K, peak_thresh=0.2)
    np.testing.assert_allclose(
        np.asarray(out["boxes_real"]), np.asarray(sfa["boxes_real"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["mask_3d"]), np.asarray(sfa["mask"])
    )


def test_batched_fusion_shards_over_mesh(rng):
    """Serving-path multi-chip: the fused program runs with its batch axis
    sharded over the 8-device data mesh (XLA partitions both networks and
    the per-frame fusion vmap; no host gather until the final fetch)."""
    from sfa3d_tpu.parallel import make_mesh, shard_batch

    (kfpn, kvars, yolo, yvars, pts, val, images, V2C, R0, P2,
     img_hw, lb_scale, lb_pad, _) = _models_and_inputs(rng)
    mesh = make_mesh(8)
    B = 8
    rep = lambda a: np.concatenate([a] * (B // a.shape[0]))
    batch = shard_batch(mesh, {
        "pts": rep(pts), "val": rep(val), "img": rep(np.asarray(images)),
        "V2C": rep(V2C), "R0": rep(R0), "P2": rep(P2), "hw": rep(img_hw),
        "scale": rep(lb_scale), "pad": rep(lb_pad),
    })
    run = build_fused_pipeline(kfpn, yolo, K=K, max_yolo=MAX_YOLO)
    out = run(kvars, yvars, batch["pts"], batch["val"], batch["img"],
              batch["V2C"], batch["R0"], batch["P2"], batch["hw"],
              batch["scale"], batch["pad"])
    assert out["boxes"].shape[0] == B
    # sharded batch in -> results match the single-device run frame-for-frame
    single = run(kvars, yvars, rep(pts), rep(val), rep(np.asarray(images)),
                 rep(V2C), rep(R0), rep(P2), rep(img_hw), rep(lb_scale),
                 rep(lb_pad))
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(single["boxes"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["valid"]), np.asarray(single["valid"])
    )
