"""Argoverse layer: calibration JSON parsing, projection, distortion,
motion compensation, BEV variant, dataset reader — against the synthetic
mini-Argoverse fixture."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from sfa3d_tpu.data.argoverse import ArgoverseDataset, load_ply_lidar, write_mini_argoverse
from sfa3d_tpu.geometry.argoverse_calib import (
    ArgoverseCalibration,
    distort_radius,
    get_city_SE3_egovehicle_at_sensor_t,
    motion_compensate_points,
    undistort_radius,
)
from sfa3d_tpu.geometry.se3 import SE3
from sfa3d_tpu.ops.bev import argoverse_points_to_bev


@pytest.fixture(scope="module")
def mini_argo(tmp_path_factory):
    root = tmp_path_factory.mktemp("argo")
    return write_mini_argoverse(str(root), n_frames=2)


def test_calibration_loading(mini_argo):
    calib = ArgoverseCalibration(
        os.path.join(mini_argo, "vehicle_calibration_info.json")
    )
    assert calib.P2.shape == (3, 3)
    assert calib.P2[0, 0] == 1392.0
    assert calib.L2C.shape == (4, 4)
    R = calib.camera_config.extrinsic[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_load_stereo_calib(mini_argo):
    """Rectified-stereo-pair loader (parity: ref_calib.py:229-257,
    corrected_calib.py:334-349): both stereo cameras load with stereo image
    dims, absent cameras are skipped (not an error), the recovered baseline
    matches the fixture's ~0.3 m, and a far point projects with the
    rectified disparity d = fx * b / z."""
    import json

    from sfa3d_tpu.geometry.argoverse_calib import (
        load_all_camera_calibs,
        load_stereo_calib,
        stereo_baseline_m,
    )

    path = os.path.join(mini_argo, "vehicle_calibration_info.json")
    stereo = load_stereo_calib(path)
    assert sorted(stereo) == ["stereo_front_left_rect", "stereo_front_right_rect"]
    left = stereo["stereo_front_left_rect"]
    right = stereo["stereo_front_right_rect"]
    assert (left.camera_config.img_width, left.camera_config.img_height) == (2464, 2056)

    b = stereo_baseline_m(left, right)
    assert b == pytest.approx(0.2986, abs=1e-6)

    # rectified disparity check: ego point 30 m ahead
    pt = np.array([[30.0, 0.0, 1.0]])
    (uv_l, _), (uv_r, _) = left.project_ego_to_image(pt), right.project_ego_to_image(pt)
    fx = left.camera_config.intrinsic[0, 0]
    # depth in the camera frame = distance along ego x minus camera x offset
    z = 30.0 - 1.6
    assert uv_l[0, 0] - uv_r[0, 0] == pytest.approx(fx * b / z, rel=1e-9)
    assert uv_l[0, 1] == pytest.approx(uv_r[0, 1], abs=1e-9)  # rectified rows

    # the all-camera loader skips cameras the JSON does not carry — the
    # fixture has only front_center + stereo pair; no ValueError surfaces
    all_cams = load_all_camera_calibs(path)
    assert "ring_front_center" in all_cams
    assert "ring_side_left" not in all_cams

    # a JSON with no stereo entries yields an empty dict (reference
    # behavior: `continue` on missing keys)
    data = json.load(open(path))
    data["camera_data"] = [c for c in data["camera_data"] if "stereo" not in c["key"]]
    nostereo = os.path.join(mini_argo, "calib_nostereo.json")
    with open(nostereo, "w") as f:
        json.dump(data, f)
    assert load_stereo_calib(nostereo) == {}


def test_projection_geometry(mini_argo):
    """A point straight ahead of the ego vehicle must project near the
    principal point; points behind the camera are NaN-masked."""
    calib = ArgoverseCalibration(
        os.path.join(mini_argo, "vehicle_calibration_info.json")
    )
    ahead = np.array([[20.0, 0.0, 1.4]])  # ego frame, on the camera axis
    uv, valid = calib.project_ego_to_image(ahead)
    assert valid.all()
    np.testing.assert_allclose(uv[0], [980.0, 604.0], atol=2.0)

    behind = np.array([[-20.0, 0.0, 1.4]])
    uv, valid = calib.project_ego_to_image(behind)
    assert not valid.any()
    assert np.isnan(uv).all()

    # lidar-frame projection chains through L2C consistently: the lidar sits
    # at ego (1.35, 0, 1.68), so shift coordinates accordingly
    pt_lidar = np.array([[20.0 - 1.35, 0.0, 1.4 - 1.68]])
    uv_l, valid_l = calib.project_lidar_to_image(pt_lidar)
    assert valid_l.all()
    np.testing.assert_allclose(uv_l[0], [980.0, 604.0], atol=2.0)


def test_image_to_ego_roundtrip(mini_argo):
    calib = ArgoverseCalibration(
        os.path.join(mini_argo, "vehicle_calibration_info.json")
    )
    pts = np.array([[15.0, 2.0, 0.5], [30.0, -5.0, 1.0]])
    uv, valid = calib.project_ego_to_image(pts)
    assert valid.all()
    # depth along the camera axis == ego x - camera x offset
    depth = pts[:, 0] - 1.6
    back = calib.project_image_to_ego(np.hstack([uv, depth[:, None]]))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_distortion_roundtrip():
    r = np.linspace(0.0, 0.8, 50)
    rd = distort_radius(r)
    ru = undistort_radius(rd)
    np.testing.assert_allclose(ru, r, atol=1e-8)
    # polynomial structure: r + k1 r^3 + k2 r^5 + k3 r^7
    k = [-0.1, 0.05, -0.01]
    manual = r + k[0] * r**3 + k[1] * r**5 + k[2] * r**7
    np.testing.assert_allclose(distort_radius(r, k), manual, atol=1e-12)


def test_motion_compensation(mini_argo):
    ts0 = sorted(
        int(f.split("_")[-1].split(".")[0])
        for f in os.listdir(os.path.join(mini_argo, "log0", "poses"))
    )
    pose0 = get_city_SE3_egovehicle_at_sensor_t(ts0[0], mini_argo, "log0")
    pose1 = get_city_SE3_egovehicle_at_sensor_t(ts0[1], mini_argo, "log0")
    assert pose0 is not None and pose1 is not None
    pts = np.array([[10.0, 0.0, 0.0]])
    moved = motion_compensate_points(pts, pose0, pose1)
    # ego moved +0.5m in x between stamps -> point shifts accordingly
    assert abs(moved[0, 0] - 10.5) < 0.01
    # identity when both poses equal
    same = motion_compensate_points(pts, pose0, pose0)
    np.testing.assert_allclose(same, pts, atol=1e-12)
    assert get_city_SE3_egovehicle_at_sensor_t(12345, mini_argo, "log0") is None


def test_argoverse_bev_kernel(rng):
    """Segment-op BEV vs a numpy oracle of the reference's per-point loop
    (argoverse_data_utils_copy.py:286-289)."""
    n = 5000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-60, 60, n)
    pts[:, 1] = rng.uniform(-60, 60, n)
    pts[:, 2] = rng.uniform(-4, 6, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    valid = np.ones(n, bool)
    bev = np.asarray(argoverse_points_to_bev(jnp.asarray(pts), jnp.asarray(valid)))
    assert bev.shape == (1000, 1000, 3)
    assert bev.min() >= 0 and bev.max() <= 255

    # oracle
    b = {"minX": -50.0, "maxX": 50.0, "minY": -50.0, "maxY": 50.0, "minZ": -3.0, "maxZ": 5.0}
    m = (
        (pts[:, 0] >= b["minX"]) & (pts[:, 0] < b["maxX"])
        & (pts[:, 1] >= b["minY"]) & (pts[:, 1] < b["maxY"])
        & (pts[:, 2] >= b["minZ"]) & (pts[:, 2] < b["maxZ"])
    )
    x, y, z, i = pts[m, 0], pts[m, 1], pts[m, 2], pts[m, 3]
    H = W = 1000
    xi = np.clip(((b["maxX"] - x) / 0.1).astype(int), 0, H - 1)
    yi = np.clip(((y - b["minY"]) / 0.1).astype(int), 0, W - 1)
    hmap = np.zeros((H, W)); imap = np.zeros((H, W)); dmap = np.zeros((H, W))
    for k in range(len(x)):
        r, c = xi[k], yi[k]
        hmap[r, c] = max(hmap[r, c], z[k])
        imap[r, c] = max(imap[r, c], i[k])
        dmap[r, c] += 1
    dmap = np.log1p(dmap)

    def norm(mp):
        return (mp - mp.min()) / max(mp.max() - mp.min(), 1e-12) * 255.0

    np.testing.assert_allclose(bev[..., 0], norm(dmap), atol=0.5)
    np.testing.assert_allclose(bev[..., 1], norm(hmap), atol=0.5)
    np.testing.assert_allclose(bev[..., 2], norm(imap), atol=0.5)


def test_dataset_reader(mini_argo):
    ds = ArgoverseDataset(mini_argo, mode="test")
    assert len(ds) == 2
    s = ds[0]
    assert s.points.shape == (131072, 4)
    assert s.valid.sum() > 10000
    assert int(s.n_labels) >= 1
    lab = s.labels[: int(s.n_labels)]
    assert set(lab[:, 0].astype(int)) <= {0, 1, 2}
    assert s.calib is not None
    # labels roundtrip through the quaternion encoding
    from sfa3d_tpu.data.synthetic import synthetic_scene

    _, orig = synthetic_scene(seed=0)
    m = (np.abs(orig[:, 1]) <= 50) & (np.abs(orig[:, 2]) <= 50)
    orig = orig[m]
    assert len(lab) == len(orig)
    np.testing.assert_allclose(lab[:, 1:7], orig[:, 1:7], atol=1e-5)
    dyaw = np.abs(np.mod(lab[:, 7] - (-orig[:, 7]) + np.pi, 2 * np.pi) - np.pi)
    assert dyaw.max() < 1e-5


def test_ply_loader(tmp_path, rng):
    n = 100
    pts = rng.uniform(-10, 10, (n, 4)).astype(np.float32)
    path = str(tmp_path / "sweep.ply")
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property float intensity\nend_header\n")
        f.write(pts.astype("<f4").tobytes())
    loaded = load_ply_lidar(path)
    np.testing.assert_allclose(loaded, pts, atol=1e-6)


def test_argoverse_train_loader(mini_argo):
    from sfa3d_tpu.data.argoverse import ArgoverseTrainLoader

    ds = ArgoverseDataset(mini_argo, mode="train")
    loader = ArgoverseTrainLoader(ds, batch_size=2, subdivisions=1)
    batch = next(iter(loader))
    assert batch["bev"].shape == (1, 2, 608, 608, 3)
    assert batch["targets"]["hm_cen"].shape == (1, 2, 152, 152, 3)
    assert float(batch["targets"]["obj_mask"].sum()) > 0
    # targets built with the Argoverse boundary: centers spread over the map
    hm = np.asarray(batch["targets"]["hm_cen"])
    assert hm.max() == 1.0


def test_create_loader_honors_dataset_argoverse(mini_argo):
    """`cli train --dataset argoverse` must actually build the Argoverse
    dataset/loader pair — the factory previously ignored configs.data.dataset
    and always constructed KittiDataset (which would misread an Argoverse
    directory layout)."""
    from sfa3d_tpu.config.train import parse_train_configs
    from sfa3d_tpu.data.argoverse import ArgoverseTrainLoader
    from sfa3d_tpu.data.loader import create_train_loader, create_val_loader

    configs = parse_train_configs([
        "--dataset", "argoverse", "--dataset_dir", mini_argo,
        "--batch_size", "2", "--effective_batch", "2", "--num_workers", "0",
    ])
    loader = create_train_loader(configs)
    assert isinstance(loader, ArgoverseTrainLoader)
    batch = next(iter(loader))
    assert batch["bev"].shape == (1, 2, 608, 608, 3)
    assert float(batch["targets"]["obj_mask"].sum()) > 0

    val = create_val_loader(configs)
    assert isinstance(val, ArgoverseTrainLoader)
    vb = next(iter(val))
    assert vb["bev"].shape[-3:] == (608, 608, 3)


def test_argoverse_targets_align_with_raster():
    """Regression: heatmap targets must land where the object sits in the
    CROPPED, x-flipped Argoverse raster (code-review finding: the original
    loader used the KITTI orientation over the full ±50 m bound)."""
    from sfa3d_tpu.data.argoverse import _argo_prepare_batch

    x_obj, y_obj = 12.0, -8.0
    # a dense point cluster at the object + sparse background
    rng = np.random.default_rng(0)
    n = 4096
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-40, 40, n)
    pts[:, 1] = rng.uniform(-40, 40, n)
    pts[:, 2] = rng.uniform(-1, 1, n)
    pts[:, 3] = 0.5
    pts[:512, 0] = x_obj + rng.uniform(-1, 1, 512)
    pts[:512, 1] = y_obj + rng.uniform(-1, 1, 512)
    valid = np.ones(n, bool)

    labels = np.zeros((50, 8), np.float32)
    labels[0] = [1, x_obj, y_obj, -1.5, 1.5, 1.8, 4.0, 0.3]
    bev, tg = _argo_prepare_batch(
        pts[None], valid[None], labels[None], np.asarray([1], np.int32)
    )
    hm = np.asarray(tg["hm_cen"])[0]  # (152, 152, 3)
    assert hm.max() == 1.0
    peak = np.unravel_index(hm[:, :, 1].argmax(), hm[:, :, 1].shape)

    # independent raster-space position: crop row = (maxX-x)/0.1 - 196,
    # heatmap = /4 (x axis flipped); col = (y+50)/0.1 - 196, /4
    want_row = int((((50.0 - x_obj) / 0.1) - 196) / 4)
    want_col = int((((y_obj + 50.0) / 0.1) - 196) / 4)
    assert abs(peak[0] - want_row) <= 1, (peak, want_row)
    assert abs(peak[1] - want_col) <= 1, (peak, want_col)

    # and the raster itself is dense there: the object cluster must appear
    # in the density channel around (4*row, 4*col) of the crop
    bev0 = np.asarray(bev)[0]
    window = bev0[4 * want_row - 8 : 4 * want_row + 8,
                  4 * want_col - 8 : 4 * want_col + 8, 0]
    assert window.mean() > bev0[..., 0].mean() * 2, "object cluster not under the target peak"

    # yaw reflection: direction target encodes pi - yaw, negated by the
    # builder => sin(-(pi-0.3)), cos(-(pi-0.3))
    d = np.asarray(tg["direction"])[0, 0]
    want = np.array([np.sin(-(np.pi - 0.3)), np.cos(-(np.pi - 0.3))], np.float32)
    np.testing.assert_allclose(d, want, atol=1e-5)
