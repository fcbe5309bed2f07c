"""Target-generation parity vs. the reference Gaussian-splat pipeline."""

import math

import numpy as np
import pytest

from tests import ref_loader
from sfa3d_tpu.config import kitti as cnf
from sfa3d_tpu.ops.targets import build_targets, compute_radius


def reference_build_targets(kdu, labels, hflipped, num_classes=3, hm_size=(152, 152), max_objects=50):
    """Oracle: drives the reference's own gen_hm_radius/compute_radius
    (kitti_data_utils.py) through the build_targets recipe
    (kitti_dataset.py:157-244)."""
    hm_l, hm_w = hm_size
    minX, maxX = cnf.boundary["minX"], cnf.boundary["maxX"]
    minY, maxY = cnf.boundary["minY"], cnf.boundary["maxY"]
    minZ, maxZ = cnf.boundary["minZ"], cnf.boundary["maxZ"]

    hm = np.zeros((num_classes, hm_l, hm_w), dtype=np.float32)
    cen_offset = np.zeros((max_objects, 2), dtype=np.float32)
    direction = np.zeros((max_objects, 2), dtype=np.float32)
    z_coor = np.zeros((max_objects, 1), dtype=np.float32)
    dimension = np.zeros((max_objects, 3), dtype=np.float32)
    indices_center = np.zeros((max_objects,), dtype=np.int64)
    obj_mask = np.zeros((max_objects,), dtype=np.uint8)

    for k in range(min(len(labels), max_objects)):
        cls_id, x, y, z, h, w, l, yaw = labels[k]
        cls_id = int(cls_id)
        yaw = -yaw
        if not ((minX <= x <= maxX) and (minY <= y <= maxY) and (minZ <= z <= maxZ)):
            continue
        if (h <= 0) or (w <= 0) or (l <= 0):
            continue
        bbox_l = l / cnf.bound_size_x * hm_l
        bbox_w = w / cnf.bound_size_y * hm_w
        radius = kdu.compute_radius((math.ceil(bbox_l), math.ceil(bbox_w)))
        radius = max(0, int(radius))
        center_y = (x - minX) / cnf.bound_size_x * hm_l
        center_x = (y - minY) / cnf.bound_size_y * hm_w
        center = np.array([center_x, center_y], dtype=np.float32)
        if hflipped:
            # corrected mirror (deliberate divergence from the reference's
            # `hm_w - center[0] - 1`, kitti_dataset.py:197 — one full cell
            # off vs the raster's array reversal; see ops/targets.py)
            center[0] = hm_w - center[0]
        center_int = center.astype(np.int32)
        if cls_id < 0:
            ignore_ids = list(range(num_classes)) if cls_id == -1 else [-cls_id - 2]
            for cls_ig in ignore_ids:
                kdu.gen_hm_radius(hm[cls_ig], center_int, radius)
            hm[ignore_ids, center_int[1], center_int[0]] = 0.9999
            continue
        kdu.gen_hm_radius(hm[cls_id], center, radius)
        indices_center[k] = center_int[1] * hm_w + center_int[0]
        cen_offset[k] = center - center_int
        dimension[k] = [h, w, l]
        direction[k] = [math.sin(yaw), math.cos(yaw)]
        if hflipped:
            direction[k, 0] = -direction[k, 0]
        z_coor[k] = z - minZ
        obj_mask[k] = 1
    return dict(hm_cen=hm, cen_offset=cen_offset, direction=direction,
                z_coor=z_coor, dim=dimension, indices_center=indices_center,
                obj_mask=obj_mask)


def random_labels(rng, n, include_ignore=False):
    labels = np.zeros((n, 8), dtype=np.float32)
    labels[:, 0] = rng.integers(0, 3, n)
    if include_ignore:
        labels[0, 0] = -1
        if n > 1:
            labels[1, 0] = -3
    labels[:, 1] = rng.uniform(1, 49, n)  # x
    labels[:, 2] = rng.uniform(-24, 24, n)  # y
    labels[:, 3] = rng.uniform(-2.5, 1.0, n)  # z
    labels[:, 4] = rng.uniform(1.0, 2.0, n)  # h
    labels[:, 5] = rng.uniform(1.5, 2.0, n)  # w
    labels[:, 6] = rng.uniform(3.0, 4.5, n)  # l
    labels[:, 7] = rng.uniform(-np.pi, np.pi, n)  # yaw
    return labels


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
@pytest.mark.parametrize("hflipped", [False, True])
def test_targets_match_reference(rng, hflipped):
    kdu = ref_loader.load("data_process.kitti_data_utils")
    labels = random_labels(rng, 12)
    # pad to the 50-slot tensor
    padded = np.zeros((50, 8), dtype=np.float32)
    padded[:12] = labels
    ref = reference_build_targets(kdu, labels, hflipped)
    ours = build_targets(padded, np.int32(12), np.bool_(hflipped))

    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["hm_cen"]), (2, 0, 1)), ref["hm_cen"], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ours["cen_offset"]), ref["cen_offset"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["direction"]), ref["direction"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["z_coor"]), ref["z_coor"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["dim"]), ref["dim"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours["indices_center"]), ref["indices_center"])
    np.testing.assert_array_equal(np.asarray(ours["obj_mask"]), ref["obj_mask"].astype(np.float32))


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_targets_out_of_bounds_and_ignore(rng):
    kdu = ref_loader.load("data_process.kitti_data_utils")
    labels = random_labels(rng, 8, include_ignore=True)
    labels[2, 1] = 60.0  # out of x range -> skipped slot
    labels[3, 4] = 0.0  # degenerate h -> skipped slot
    padded = np.zeros((50, 8), dtype=np.float32)
    padded[:8] = labels
    ref = reference_build_targets(kdu, labels, False)
    ours = build_targets(padded, np.int32(8), np.bool_(False))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["hm_cen"]), (2, 0, 1)), ref["hm_cen"], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(ours["obj_mask"]), ref["obj_mask"].astype(np.float32))


def test_label_exactly_on_max_boundary_is_dropped(rng):
    """x==maxX / y==maxY pass the inclusive range check but land on the
    guard cell (center_int == hm size; -1 under hflip) the raster also
    drops. Such labels must not become positives with a wrong/overflowing
    indices_center (the reference IndexErrors on this edge)."""
    import sfa3d_tpu.config.kitti as cnf

    labels = random_labels(rng, 4)
    labels[0, 1] = cnf.boundary["maxX"]  # center row == hm_h
    labels[1, 2] = cnf.boundary["maxY"]  # center col == hm_w
    padded = np.zeros((50, 8), dtype=np.float32)
    padded[:4] = labels
    for hflip in (False, True):
        ours = build_targets(padded, np.int32(4), np.bool_(hflip))
        obj_mask = np.asarray(ours["obj_mask"])
        assert obj_mask[0] == 0.0 and obj_mask[1] == 0.0, hflip
        idx = np.asarray(ours["indices_center"])
        hm_cells = ours["hm_cen"].shape[0] * ours["hm_cen"].shape[1]
        assert (idx >= 0).all() and (idx < hm_cells).all()


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_compute_radius_matches(rng):
    kdu = ref_loader.load("data_process.kitti_data_utils")
    for _ in range(50):
        h = float(rng.uniform(1, 60))
        w = float(rng.uniform(1, 60))
        ref = kdu.compute_radius((math.ceil(h), math.ceil(w)))
        ours = float(compute_radius((math.ceil(h), math.ceil(w))))
        assert abs(ref - ours) < 1e-3


def test_hflip_targets_mirror_subcell_exact():
    """The flipped target center must be the EXACT continuous mirror
    hm_w - c of the unflipped one (array reversal maps intra-pixel fraction
    f -> 1-f). The reference's hm_w - c - 1 (kitti_dataset.py:197) is a
    full cell off; trained through 50%-flipped batches that contradiction
    taught a systematic -0.5-cell y bias on every detection (round-4
    measurement: median dy = -0.53 cells, dx unbiased)."""
    import numpy as np

    from sfa3d_tpu.ops.targets import build_targets

    hm_w = 152
    labels = np.zeros((50, 8), np.float32)
    # three objects at asymmetric sub-cell y positions
    for k, (x, y) in enumerate([(20.0, 3.37), (30.0, -7.81), (12.0, 0.41)]):
        labels[k] = [1, x, y, -1.0, 1.5, 1.7, 4.0, 0.3]
    tn = build_targets(labels, np.int32(3), np.bool_(False))
    tf = build_targets(labels, np.int32(3), np.bool_(True))
    for k in range(3):
        ix_n = int(tn["indices_center"][k]) % hm_w
        ix_f = int(tf["indices_center"][k]) % hm_w
        c_n = ix_n + float(tn["cen_offset"][k][0])
        c_f = ix_f + float(tf["cen_offset"][k][0])
        assert c_f == pytest.approx(hm_w - c_n, abs=1e-4), (k, c_n, c_f)
        # y (row) unchanged by a W-flip
        assert int(tn["indices_center"][k]) // hm_w == int(tf["indices_center"][k]) // hm_w
