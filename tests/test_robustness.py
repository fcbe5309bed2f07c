"""Adversarial host-pipeline property tests (hardening beyond the reference).

Reference behavior being hardened: get_filtered_lidar
(kitti_data_utils.py:228-251) and makeBEVMap (kitti_bev_utils.py:22-55)
assume well-formed scans — degenerate inputs (empty scans, NaNs, budget
overflow, out-of-range intensities) crash or silently corrupt. Here the
fixed-shape host pipeline is exercised on those inputs through BOTH host
paths (numpy and native C++, bit-equally) plus the device raster kernel,
and the CLAUDE.md invariant — truncation must warn, never silently lose
scan data — is asserted.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sfa3d_tpu import native
from sfa3d_tpu.config import kitti as cnf
from sfa3d_tpu.ops.bev import (
    _filter_and_pad_numpy,
    _pad_raw,
    filter_and_pad_points,
    points_to_bev,
)

_HAS_NATIVE = native.available()


def _both_paths(pts, max_points):
    """Run numpy and (when built) native filter paths; assert bit-equality;
    return the numpy result."""
    want = _filter_and_pad_numpy(pts, max_points, cnf.boundary)
    if _HAS_NATIVE:
        got = native.filter_pad_points(pts, max_points, cnf.boundary)
        assert got is not None
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    return want


def test_zero_point_scan():
    pts = np.zeros((0, 4), np.float32)
    out, valid = _both_paths(pts, 256)
    assert not valid.any() and not out.any()
    bev = np.asarray(points_to_bev(jnp.asarray(out), jnp.asarray(valid)))
    assert bev.shape == (cnf.BEV_HEIGHT, cnf.BEV_WIDTH, 3) and not bev.any()


def test_all_nan_scan():
    pts = np.full((1000, 4), np.nan, np.float32)
    out, valid = _both_paths(pts, 256)
    assert not valid.any()
    # feed NaNs straight to the device kernel (valid=True): range gates must
    # drop them, never poison the raster
    bev = np.asarray(
        points_to_bev(jnp.asarray(pts), jnp.ones((1000,), bool))
    )
    assert np.isfinite(bev).all() and not bev.any()


def test_overflow_warns_never_silent():
    """> max_points in-range points: the CLAUDE.md invariant — warn, don't
    silently truncate — on BOTH host paths, with identical outputs."""
    n, cap = 4000, 1024
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = 10.0
    pts[:, 3] = np.arange(n) / n  # records scan order
    with pytest.warns(RuntimeWarning, match="in-range points"):
        want = _filter_and_pad_numpy(pts, cap, cnf.boundary)
    if _HAS_NATIVE:
        with pytest.warns(RuntimeWarning, match="in-range points"):
            got = native.filter_pad_points(pts, cap, cnf.boundary)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    # truncation keeps scan order: first cap points survive
    np.testing.assert_allclose(want[0][:, 3], np.arange(cap) / n, rtol=1e-6)


@pytest.mark.skipif(not _HAS_NATIVE, reason="native build unavailable")
def test_overflow_warns_fused_reader(tmp_path):
    n, cap = 4000, 512
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = 10.0
    path = str(tmp_path / "big.bin")
    pts.tofile(path)
    with pytest.warns(RuntimeWarning, match="in-range points"):
        got = native.read_velodyne_filtered(path, cap, cnf.boundary)
    assert got is not None and got[1].all()


def test_exact_budget_does_not_warn(recwarn):
    """kept == max_points exactly is NOT an overflow."""
    cap = 256
    pts = np.zeros((cap, 4), np.float32)
    pts[:, 0] = 10.0
    _both_paths(pts, cap)
    assert not [w for w in recwarn if issubclass(w.category, RuntimeWarning)]


def test_pad_raw_truncation_warns():
    pts = np.zeros((300, 4), np.float32)
    with pytest.warns(RuntimeWarning, match="truncating"):
        out, valid = _pad_raw(pts, 128)
    assert valid.sum() == 128


def test_intensity_out_of_range_clamped():
    """Intensities outside [0, 1] must clamp in the raster, not wrap or
    poison neighbouring channels of the packed key."""
    pts = np.array(
        [
            [10.0, 0.0, 0.0, 1.5],   # over-range
            [12.0, 0.0, 0.0, -0.5],  # negative
            [14.0, 0.0, 0.0, np.inf],
        ],
        np.float32,
    )
    bev = np.asarray(points_to_bev(jnp.asarray(pts), jnp.ones((3,), bool)))
    assert np.isfinite(bev).all()
    assert bev[..., 0].min() >= 0.0 and bev[..., 0].max() <= 1.0
    occupied = bev[..., 2] > 0
    assert occupied.sum() == 3
    # the over-range intensities saturate at exactly 1.0
    assert bev[..., 0].max() == 1.0


def test_density_saturation_boundary():
    """Cells holding 1 / 62 / 63 / 200 points: density must follow
    min(1, log(n+1)/log64) BIT-exactly, saturating at n=63 (ops/bev.py packs
    a 6-bit saturating count — 63 and 200 must both give exactly 1.0)."""
    disc = (cnf.boundary["maxX"] - cnf.boundary["minX"]) / cnf.BEV_HEIGHT
    counts = [1, 62, 63, 200]
    rows = []
    cells = []
    for i, n in enumerate(counts):
        # one distinct cell per group, points at the cell center
        row, col = 100 + 5 * i, 304
        x = cnf.boundary["minX"] + (row + 0.5) * disc
        y = (col - cnf.BEV_WIDTH // 2 + 0.5) * disc
        for _ in range(n):
            rows.append([x, y, 0.0, 0.5])
        cells.append((row, col))
    pts = np.asarray(rows, np.float32)
    bev = np.asarray(
        points_to_bev(jnp.asarray(pts), jnp.ones((len(pts),), bool))
    )
    for (row, col), n in zip(cells, counts):
        expect = min(1.0, np.log(min(n, 63) + 1.0) / np.log(64.0))
        np.testing.assert_allclose(
            bev[row, col, 2], expect, atol=2.4e-7, err_msg=str(n)
        )
    # saturation consistency is EXACT: 63 and 200 points give the same value
    assert bev[cells[2][0], cells[2][1], 2] == bev[cells[3][0], cells[3][1], 2]


def test_empty_label_file(tmp_path):
    """An empty label file is a legal frame with zero objects: the sample
    loads, obj_mask is all zero, heatmap target is empty."""
    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    root = str(tmp_path / "kitti")
    write_mini_kitti(root, n_frames=2)
    label = f"{root}/training/label_2/000000.txt"
    open(label, "w").close()
    ds = KittiDataset(root, mode="train", lidar_aug=None, hflip_prob=0.0)
    s = ds[0]
    assert s.labels.shape[0] == 0 or not np.any(s.labels)


@pytest.mark.skipif(not _HAS_NATIVE, reason="native build unavailable")
def test_truncated_bin_file(tmp_path):
    """A .bin whose size is not a multiple of 16 bytes (torn final point):
    the native streaming reader drops ONLY the torn tail and keeps every
    complete point (the numpy fallback raises on reshape instead)."""
    pts = np.zeros((100, 4), np.float32)
    pts[:, 0] = 10.0
    pts[:, 3] = np.arange(100)
    blob = pts.tobytes() + pts[0, :2].tobytes()  # + half a point
    path = str(tmp_path / "torn.bin")
    with open(path, "wb") as f:
        f.write(blob)
    got = native.read_velodyne_filtered(path, 256, cnf.boundary)
    assert got is not None
    assert got[1].sum() == 100
    np.testing.assert_array_equal(got[0][:100], pts)


def test_single_point_cell_channels():
    """1-point cell: height/intensity quantization round-trips within the
    documented resolutions (6.1e-5 / 1.2e-4)."""
    z, r = 0.37, 0.66
    pts = np.array([[10.0, 0.0, z, r]], np.float32)
    bev = np.asarray(points_to_bev(jnp.asarray(pts), jnp.ones((1,), bool)))
    occ = bev[..., 2] > 0
    assert occ.sum() == 1
    z_range = cnf.boundary["maxZ"] - cnf.boundary["minZ"]
    got_h = bev[..., 1][occ][0]
    got_r = bev[..., 0][occ][0]
    assert abs(got_h - (z - cnf.boundary["minZ"]) / z_range) < 6.2e-5 * 2
    assert abs(got_r - r) < 1.3e-4 * 2
