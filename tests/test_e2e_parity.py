"""THE acceptance check (BASELINE.md): end-to-end detections must match the
PyTorch reference within 1e-3 — same weights (ported), same BEV input,
reference pipeline (model -> _sigmoid -> decode -> post_processing ->
convert_det_to_real_values) vs. ours (detect_bev)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import ref_loader
from sfa3d_tpu.models import create_model
from sfa3d_tpu.models.kfpn import HEADS
from sfa3d_tpu.models.port import port_kfpn_state_dict
from sfa3d_tpu.ops.bev import make_bev_map
from sfa3d_tpu.ops.decode import masked_detections_to_numpy
from sfa3d_tpu.pipeline import detect_bev


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_full_pipeline_detections_match_reference(rng):
    import torch

    fpn = ref_loader.load("models.fpn_resnet")
    ev = ref_loader.load("utils.evaluation_utils")
    tu = ref_loader.load("utils.torch_utils")

    torch.manual_seed(7)
    ref_model = fpn.get_pose_net(18, dict(HEADS), 64, imagenet_pretrained=False)
    # push hm bias up so random weights yield detections above threshold
    with torch.no_grad():
        for idx in range(3):
            getattr(ref_model, f"fpn{idx}_hm_cen")[2].bias += 2.0
    ref_model.eval()
    variables = port_kfpn_state_dict(ref_model.state_dict(), num_layers=18)
    model = create_model("fpn_resnet_18")

    # realistic BEV input from a synthetic scene
    from sfa3d_tpu.data.synthetic import synthetic_scene

    scan, _ = synthetic_scene(seed=5)
    bev = make_bev_map(scan)  # (608, 608, 3)

    K, thresh = 50, 0.2

    # --- reference path (torch, NCHW) ---
    with torch.no_grad():
        t_in = torch.from_numpy(np.transpose(bev[None], (0, 3, 1, 2)).copy())
        outputs = ref_model(t_in)
        outputs["hm_cen"] = tu._sigmoid(outputs["hm_cen"])
        outputs["cen_offset"] = tu._sigmoid(outputs["cen_offset"])
        dets = ev.decode(
            outputs["hm_cen"], outputs["cen_offset"], outputs["direction"],
            outputs["z_coor"], outputs["dim"], K=K,
        ).numpy()
    ref_pp = ev.post_processing(dets, num_classes=3, down_ratio=4, peak_thresh=thresh)
    ref_real = ev.convert_det_to_real_values(ref_pp[0])

    # --- our path (jit, NHWC) ---
    _, _, boxes_real, mask = detect_bev(
        model, variables, jnp.asarray(bev[None]), K=K, peak_thresh=thresh
    )
    ours_real = np.asarray(boxes_real)[0][np.asarray(mask)[0]]

    assert len(ref_real) > 0, "fixture produced no detections — test is vacuous"
    assert len(ours_real) == len(ref_real)
    # match rows by sorting on (cls, x, y)
    ref_sorted = ref_real[np.lexsort((ref_real[:, 2], ref_real[:, 1], ref_real[:, 0]))]
    ours_sorted = ours_real[np.lexsort((ours_real[:, 2], ours_real[:, 1], ours_real[:, 0]))]
    np.testing.assert_allclose(ours_sorted, ref_sorted, atol=1e-3)


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_full_pipeline_from_raw_points(rng):
    """Same check but starting from the RAW scan on our side (fused
    filter+raster in the kernel) vs the reference's host filter+raster."""
    import torch

    fpn = ref_loader.load("models.fpn_resnet")
    kdu = ref_loader.load("data_process.kitti_data_utils")
    kbu = ref_loader.load("data_process.kitti_bev_utils")

    torch.manual_seed(3)
    ref_model = fpn.get_pose_net(18, dict(HEADS), 64, imagenet_pretrained=False)
    ref_model.eval()
    variables = port_kfpn_state_dict(ref_model.state_dict(), num_layers=18)
    model = create_model("fpn_resnet_18")

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.data.synthetic import synthetic_scene
    from sfa3d_tpu.pipeline import detect_frames
    from sfa3d_tpu.ops.bev import _pad_raw

    scan, _ = synthetic_scene(seed=11)
    # reference raster
    filtered = kdu.get_filtered_lidar(scan.copy(), cnf.boundary)
    ref_bev = kbu.makeBEVMap(filtered, cnf.boundary)  # (3, H, W)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(ref_bev[None].astype(np.float32)))
        ref_hm = ref_out["hm_cen"].numpy()

    # our raw-scan path: host range-filter keeps the cloud inside the padded
    # budget (raw synthetic scenes exceed MAX_POINTS), kernel re-filters
    b = cnf.boundary
    m = (
        (scan[:, 0] >= b["minX"]) & (scan[:, 0] <= b["maxX"])
        & (scan[:, 1] >= b["minY"]) & (scan[:, 1] <= b["maxY"])
        & (scan[:, 2] >= b["minZ"]) & (scan[:, 2] <= b["maxZ"])
    )
    pts, valid = _pad_raw(scan[m], cnf.MAX_POINTS_FILTERED)
    out = detect_frames(model, variables, pts[None], valid[None], K=50, peak_thresh=0.2)
    ours_hm = np.transpose(np.asarray(out["bev"]), (0, 3, 1, 2))
    # packed-key raster quantization: 13-bit height / 12-bit intensity
    # (<=1.3e-4 map error; detection parity budget is 1e-3). Cells whose
    # top two points land in the same 0.5 mm height bucket tie-break by
    # intensity instead of exact z — a handful of pixels per frame may
    # carry a different (equally valid) point's intensity. The next
    # assertion bounds the effect on the network outputs at 1e-3.
    diff = np.abs(ours_hm[0] - ref_bev)
    tie_pixels = int((diff > 3e-4).sum())
    assert tie_pixels <= 16, f"{tie_pixels} pixels beyond quantization noise"

    fwd = model.apply(variables, out["bev"], train=False)
    ours_hm_out = np.transpose(np.asarray(fwd["hm_cen"]), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_hm_out, ref_hm, atol=1e-3)


def test_bf16_fast_mode_bounds(rng):
    """The shipped dtypes, characterized: float32 is the parity-claiming
    default (the tests above), and bfloat16 is an explicit fast mode whose
    drift is bounded here. bf16 carries ~3 significant digits, so metric box
    coordinates move by decimeters — NOT within the 1e-3 acceptance
    tolerance; that is why Detector/entry() default to float32."""
    from sfa3d_tpu.data.synthetic import synthetic_scene
    from sfa3d_tpu.models import clamped_sigmoid
    from sfa3d_tpu.pipeline import init_detector

    scan, _ = synthetic_scene(seed=5)
    bev = jnp.asarray(make_bev_map(scan)[None])

    m32 = create_model("fpn_resnet_18")
    variables = init_detector(m32, jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(lambda t: np.array(t), variables)
    for i in range(3):
        variables["params"][f"fpn{i}_hm_cen"]["conv2"]["bias"] += 2.0
    m16 = create_model("fpn_resnet_18", dtype=jnp.bfloat16)

    out32 = m32.apply(variables, bev, train=False)
    out16 = m16.apply(variables, bev, train=False)
    # head outputs are f32-castable and finite; post-sigmoid heatmaps agree
    # to ~bf16 resolution (documented fast-mode bound)
    hm32 = np.asarray(clamped_sigmoid(out32["hm_cen"]))
    hm16 = np.asarray(clamped_sigmoid(out16["hm_cen"].astype(jnp.float32)))
    assert np.isfinite(hm16).all()
    np.testing.assert_allclose(hm16, hm32, atol=0.05)

    # end-to-end: each top-5 f32 detection has a same-class bf16 detection
    # within 1 BEV pixel (rank order of near-tied peaks may differ)
    _, bb32, _, mk32 = detect_bev(m32, variables, bev, K=50, peak_thresh=0.2)
    _, bb16, _, mk16 = detect_bev(m16, variables, bev, K=50, peak_thresh=0.2)
    b32 = np.asarray(bb32)[0][np.asarray(mk32)[0]]
    b16 = np.asarray(bb16)[0][np.asarray(mk16)[0]]
    assert len(b32) and len(b16)
    top = b32[np.argsort(-b32[:, 1])][:5]
    for row in top:
        same_cls = b16[b16[:, 0] == row[0]]
        assert len(same_cls), f"class {row[0]} missing in bf16 detections"
        d = np.hypot(same_cls[:, 2] - row[2], same_cls[:, 3] - row[3])
        assert d.min() <= 1.0, f"nearest bf16 match {d.min():.2f}px away"


def test_detector_default_dtype_is_parity_mode():
    """The facade must ship the configuration the acceptance test covers."""
    import inspect

    from sfa3d_tpu.detector import Detector

    assert inspect.signature(Detector.__init__).parameters["dtype"].default == "float32"
