"""SLAM layer: JAX RANSAC PnP, epipolar estimation, calibration sources."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfa3d_tpu.slam.calib_sources import SLAM_METHODS, get_calibration_from_slam
from sfa3d_tpu.slam.epipolar import (
    essential_from_fundamental,
    estimate_fundamental_ransac,
    recover_pose,
    sampson_distance,
    triangulate_points,
)
from sfa3d_tpu.slam.pnp import ransac_pnp, rodrigues

K = np.array([[720.0, 0, 609.0], [0, 720.0, 172.0], [0, 0, 1.0]], np.float32)


def synthetic_pose_problem(rng, n=64, n_outliers=12, noise=0.5):
    R_gt = np.asarray(rodrigues(np.array([0.05, -0.1, 0.03])))
    t_gt = np.array([0.3, -0.2, 0.5])
    pts3d = np.stack(
        [rng.uniform(-8, 8, n), rng.uniform(-3, 3, n), rng.uniform(6, 25, n)], axis=1
    )
    cam = pts3d @ R_gt.T + t_gt
    uv = (cam @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    uv += rng.normal(0, noise, uv.shape)
    idx = rng.permutation(n)[:n_outliers]
    uv[idx] += rng.uniform(40, 200, (n_outliers, 2))  # gross outliers
    return pts3d.astype(np.float32), uv.astype(np.float32), R_gt, t_gt


def test_rodrigues_matches_cv2():
    import cv2

    for rvec in ([0.1, -0.2, 0.3], [0.0, 0.0, 0.0], [1.5, 0.5, -0.7]):
        ours = np.asarray(rodrigues(np.asarray(rvec, np.float32)))
        ref, _ = cv2.Rodrigues(np.asarray(rvec, np.float64))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ransac_pnp_recovers_pose_with_outliers(rng):
    pts3d, uv, R_gt, t_gt = synthetic_pose_problem(rng)
    valid = np.ones(len(pts3d), bool)
    pose, mask, n_in = ransac_pnp(
        pts3d, uv, K, valid, jax.random.PRNGKey(0), reprojection_error=4.0
    )
    pose = np.asarray(pose)
    assert int(n_in) >= 40  # inliers found despite 12 gross outliers
    np.testing.assert_allclose(pose[:, :3], R_gt, atol=5e-3)
    np.testing.assert_allclose(pose[:, 3], t_gt, atol=5e-2)


def test_ransac_pnp_vs_cv2(rng):
    import cv2

    pts3d, uv, R_gt, t_gt = synthetic_pose_problem(rng, n_outliers=0, noise=0.3)
    valid = np.ones(len(pts3d), bool)
    pose, _, _ = ransac_pnp(pts3d, uv, K, valid, jax.random.PRNGKey(1))
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        pts3d.astype(np.float64), uv.astype(np.float64), K.astype(np.float64), None,
        flags=cv2.SOLVEPNP_EPNP, reprojectionError=8.0,
    )
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    np.testing.assert_allclose(np.asarray(pose)[:, :3], R_cv, atol=1e-2)
    np.testing.assert_allclose(np.asarray(pose)[:, 3], tvec.ravel(), atol=5e-2)


def stereo_problem(rng, n=128, n_outliers=20):
    R_gt = np.asarray(rodrigues(np.array([0.02, 0.3, -0.01])))
    t_gt = np.array([-0.54, 0.005, 0.01])
    t_gt = t_gt / np.linalg.norm(t_gt)
    X = np.stack(
        [rng.uniform(-10, 10, n), rng.uniform(-4, 4, n), rng.uniform(5, 40, n)], axis=1
    )
    uv1 = X @ K.T
    uv1 = uv1[:, :2] / uv1[:, 2:3]
    cam2 = X @ R_gt.T + t_gt
    uv2 = cam2 @ K.T
    uv2 = uv2[:, :2] / uv2[:, 2:3]
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    idx = rng.permutation(n)[:n_outliers]
    uv2[idx] += rng.uniform(30, 150, (n_outliers, 2))
    return uv1.astype(np.float32), uv2.astype(np.float32), R_gt, t_gt


def test_fundamental_and_pose_recovery(rng):
    uv1, uv2, R_gt, t_gt = stereo_problem(rng)
    valid = np.ones(len(uv1), bool)
    F, inliers = estimate_fundamental_ransac(
        uv1, uv2, valid, jax.random.PRNGKey(0), threshold=2.0
    )
    assert int(np.asarray(inliers).sum()) >= 90
    E = essential_from_fundamental(F, jnp.asarray(K), jnp.asarray(K))
    R, t, frac = recover_pose(E, uv1, uv2, jnp.asarray(K), jnp.asarray(inliers))
    R, t = np.asarray(R), np.asarray(t)
    assert float(frac) > 0.7
    np.testing.assert_allclose(R, R_gt, atol=2e-2)
    # translation recovered up to sign+scale: compare directions
    cos = abs(np.dot(t / np.linalg.norm(t), t_gt))
    assert cos > 0.99


def test_triangulation_roundtrip(rng):
    X = np.stack(
        [rng.uniform(-5, 5, 32), rng.uniform(-2, 2, 32), rng.uniform(5, 20, 32)], axis=1
    )
    R = np.asarray(rodrigues(np.array([0.0, 0.2, 0.0])))
    t = np.array([-0.5, 0.0, 0.0])
    P1 = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    P2 = np.concatenate([R, t[:, None]], axis=1)
    n1 = X[:, :2] / X[:, 2:3]
    c2 = X @ R.T + t
    n2 = c2[:, :2] / c2[:, 2:3]
    Xr = np.asarray(triangulate_points(jnp.asarray(P1), jnp.asarray(P2),
                                       jnp.asarray(n1), jnp.asarray(n2)))
    np.testing.assert_allclose(Xr, X, atol=1e-3)


@pytest.mark.parametrize("method", SLAM_METHODS)
def test_calibration_sources(method):
    calib = get_calibration_from_slam(
        "/fake/image_2/000042.png", slam_method=method, use_pnp=(method == "VISUAL_SLAM_SIM")
    )
    assert calib["P2"].shape == (3, 4)
    assert calib["R0"].shape == (3, 3)
    assert calib["V2C"].shape == (3, 4)
    # rotations stay orthonormal after simulated drift
    np.testing.assert_allclose(calib["R0"] @ calib["R0"].T, np.eye(3), atol=2e-3)  # base R0 has 4-digit precision


def test_calibration_source_drift_is_frame_indexed():
    c0 = get_calibration_from_slam("/x/000000.png", slam_method="LIDAR_SLAM_SIM")
    c9 = get_calibration_from_slam("/x/000900.png", slam_method="LIDAR_SLAM_SIM")
    assert not np.allclose(c0["V2C"], c9["V2C"])
    assert np.allclose(c0["P2"], c9["P2"])  # intrinsics static


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        get_calibration_from_slam("/x/0.png", slam_method="bogus")


def test_stereo_calibration_synthetic_images(rng):
    """End-to-end stereo calib on rendered random-texture stereo pair."""
    import cv2

    from sfa3d_tpu.slam.stereo import perform_targetless_stereo_calibration

    # render a textured plane seen by two horizontally displaced cameras
    base = (rng.uniform(0, 255, (400, 600)) > 127).astype(np.uint8) * 255
    base = cv2.GaussianBlur(base, (5, 5), 0)
    left = base[:, 40:560]
    right = base[:, 20:540]  # pure horizontal shift = stereo on a plane
    Ks = np.array([[500.0, 0, 260], [0, 500.0, 200], [0, 0, 1]], np.float32)
    result = perform_targetless_stereo_calibration(left, right, Ks, min_matches=30)
    # a pure-translation planar scene is degenerate for E-estimation accuracy
    # but the pipeline must run and report a structured result either way
    assert result.n_matches > 30
    assert isinstance(result.success, bool)
    if result.success:
        assert result.R.shape == (3, 3)
        np.testing.assert_allclose(result.R @ result.R.T, np.eye(3), atol=1e-3)


def test_stereo_calibration_recovers_kitti_baseline(tmp_path):
    """Ground-truth regression on the full ORB -> F-RANSAC -> E -> pose
    stack: the mini-KITTI fixture renders image_2/image_3 through P2/P3
    differing by the real 0.54 m x-baseline (data/synthetic.py), so the
    recovered pose must be R ~ identity and t along +-x (E fixes t only up
    to scale/sign). This is the stereo_calibration_yolo.py:320-532 flow on
    imagery with KNOWN extrinsics, not just 'it runs'."""
    import cv2

    from sfa3d_tpu.data.synthetic import write_mini_kitti
    from sfa3d_tpu.geometry.calibration import read_calib_file
    from sfa3d_tpu.slam.stereo import perform_targetless_stereo_calibration

    root = write_mini_kitti(str(tmp_path / "kitti"), n_frames=1)
    left = cv2.imread(f"{root}/training/image_2/000000.png", cv2.IMREAD_GRAYSCALE)
    right = cv2.imread(f"{root}/training/image_3/000000.png", cv2.IMREAD_GRAYSCALE)
    assert left is not None and right is not None and left.shape == right.shape
    K = read_calib_file(f"{root}/training/calib/000000.txt")["P2"].reshape(3, 4)[:, :3]

    result = perform_targetless_stereo_calibration(left, right, K, min_matches=30)
    assert result.success, result.reason
    assert result.n_inliers >= 100
    # rotation: within ~3 degrees of identity (trace(R) = 1 + 2 cos(angle))
    angle = np.degrees(np.arccos(np.clip((np.trace(result.R) - 1) / 2, -1, 1)))
    assert angle < 3.0, f"rotation off identity by {angle:.2f} deg"
    t = np.asarray(result.t, np.float64).ravel()
    t = t / np.linalg.norm(t)
    assert abs(t[0]) > 0.98, f"translation not along the x baseline: {t}"
