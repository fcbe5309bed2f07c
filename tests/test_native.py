"""Native (C++) host preprocessing vs the numpy oracle.

The native kernels (sfa3d_tpu/native/preproc.cpp) must be BIT-equal to the
numpy path (ops/bev._filter_and_pad_numpy) — same kept set, same order, same
truncation, same zero padding. Skipped when no compiler is available (the
package then runs the numpy path everywhere).
"""

import os

import numpy as np
import pytest

from sfa3d_tpu import native
from sfa3d_tpu.config import kitti as cnf
from sfa3d_tpu.ops.bev import _filter_and_pad_numpy, filter_and_pad_points

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build unavailable: {native.build_error()}"
)


def _random_cloud(rng, n, with_nans=True):
    pts = rng.uniform(-60, 60, (n, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-5, 3, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    if with_nans and n:
        bad = rng.integers(0, n, max(1, n // 50))
        pts[bad, rng.integers(0, 4, len(bad))] = np.nan
    return pts


@pytest.mark.parametrize("n", [0, 1, 7, 4096, 120_000])
def test_filter_pad_bit_equal(n):
    rng = np.random.default_rng(n + 1)
    pts = _random_cloud(rng, n)
    # exact-boundary rows exercise the >=/<= edges
    if n >= 7:
        pts[0] = [cnf.boundary["minX"], 0.0, 0.0, 0.5]
        pts[1] = [cnf.boundary["maxX"], 0.0, 0.0, 0.5]
        pts[2] = [10.0, cnf.boundary["minY"], 0.0, 0.5]
        pts[3] = [10.0, cnf.boundary["maxY"], 0.0, 0.5]
        pts[4] = [10.0, 0.0, cnf.boundary["minZ"], 0.5]
        pts[5] = [10.0, 0.0, cnf.boundary["maxZ"], 0.5]
        pts[6] = [10.0, 0.0, 0.0, np.nan]  # NaN intensity is KEPT
    for max_points in (64, 32768):
        got = native.filter_pad_points(pts, max_points, cnf.boundary)
        assert got is not None
        want = _filter_and_pad_numpy(pts, max_points, cnf.boundary)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_read_filter_pad_matches_in_memory(tmp_path):
    rng = np.random.default_rng(0)
    pts = _random_cloud(rng, 50_000)
    path = str(tmp_path / "scan.bin")
    pts.tofile(path)
    got = native.read_velodyne_filtered(path, 32768, cnf.boundary)
    assert got is not None
    want = _filter_and_pad_numpy(pts, 32768, cnf.boundary)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_read_missing_file_returns_none(tmp_path):
    assert native.read_velodyne_filtered(
        str(tmp_path / "nope.bin"), 64, cnf.boundary
    ) is None


def test_truncation_keeps_scan_order():
    rng = np.random.default_rng(3)
    pts = np.zeros((1000, 4), np.float32)
    pts[:, 0] = 10.0
    pts[:, 3] = np.arange(1000)  # intensity records original order
    got = native.filter_pad_points(pts, 128, cnf.boundary)
    np.testing.assert_array_equal(got[0][:, 3], np.arange(128, dtype=np.float32))
    assert got[1].all()


def test_public_api_uses_native_and_agrees():
    rng = np.random.default_rng(4)
    pts = _random_cloud(rng, 20_000)
    a = filter_and_pad_points(pts, max_points=8192)
    b = _filter_and_pad_numpy(pts, 8192, cnf.boundary)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_dataset_identical_with_and_without_native(tmp_path, monkeypatch):
    """KittiSample tensors are identical whether the fused native reader or
    the numpy path produced them (same rng stream, no aug)."""
    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    root = str(tmp_path / "kitti")
    write_mini_kitti(root, n_frames=2)
    ds = KittiDataset(root, mode="val", lidar_aug=None, hflip_prob=0.0)
    s_native = ds[0]
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    ds2 = KittiDataset(root, mode="val", lidar_aug=None, hflip_prob=0.0)
    s_numpy = ds2[0]
    np.testing.assert_array_equal(s_native.points, s_numpy.points)
    np.testing.assert_array_equal(s_native.valid, s_numpy.valid)
    np.testing.assert_array_equal(s_native.labels, s_numpy.labels)
