"""Targetless stereo self-calibration.

Parity with reference stereo_calibration_yolo.py:121-318: ORB features +
cross-checked Hamming matching on the host, then fundamental-matrix RANSAC,
essential matrix, pose recovery, and the >=70% triangulation-cheirality
validity check — the estimation chain runs as JAX programs (slam/epipolar.py)
instead of cv2. Writes KITTI-format calibration files with the estimated
stereo extrinsics appended as comments.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np


@dataclass
class StereoCalibResult:
    success: bool
    R: Optional[np.ndarray]
    t: Optional[np.ndarray]
    n_matches: int
    n_inliers: int
    cheirality_fraction: float
    reason: str = ""


def match_orb_features(
    img_left: np.ndarray, img_right: np.ndarray, n_features: int = 5000
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side ORB(5000) + BFMatcher(Hamming, crossCheck) match extraction
    (stereo_calibration_yolo.py:135-160). Returns matched (N, 2) pixel
    arrays for left/right, sorted by match distance."""
    import cv2

    orb = cv2.ORB_create(nfeatures=n_features)
    kp1, des1 = orb.detectAndCompute(img_left, None)
    kp2, des2 = orb.detectAndCompute(img_right, None)
    if des1 is None or des2 is None or len(kp1) < 8 or len(kp2) < 8:
        return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    matches = sorted(bf.match(des1, des2), key=lambda m: m.distance)
    p1 = np.asarray([kp1[m.queryIdx].pt for m in matches], np.float32)
    p2 = np.asarray([kp2[m.trainIdx].pt for m in matches], np.float32)
    return p1, p2


def perform_targetless_stereo_calibration(
    img_left: np.ndarray,
    img_right: np.ndarray,
    K: np.ndarray,
    *,
    min_matches: int = 50,
    min_cheirality: float = 0.7,
    max_pairs: int = 1024,
    seed: int = 0,
) -> StereoCalibResult:
    """Full pipeline (stereo_calibration_yolo.py:121-270): ORB -> F(RANSAC)
    -> E -> recoverPose -> rotation validity + cheirality >= 70%."""
    import jax

    from sfa3d_tpu.slam.epipolar import (
        essential_from_fundamental,
        estimate_fundamental_ransac,
        recover_pose,
    )

    p1, p2 = match_orb_features(img_left, img_right)
    n_matches = len(p1)
    if n_matches < min_matches:
        return StereoCalibResult(False, None, None, n_matches, 0, 0.0,
                                 f"too few matches ({n_matches} < {min_matches})")

    n_pad = max_pairs
    a = np.zeros((n_pad, 2), np.float32)
    b = np.zeros((n_pad, 2), np.float32)
    valid = np.zeros((n_pad,), bool)
    m = min(n_matches, n_pad)
    a[:m], b[:m], valid[:m] = p1[:m], p2[:m], True

    F, inliers = estimate_fundamental_ransac(
        a, b, valid, jax.random.PRNGKey(seed), threshold=3.0
    )
    n_inliers = int(np.asarray(inliers).sum())
    if n_inliers < 8:
        return StereoCalibResult(False, None, None, n_matches, n_inliers, 0.0,
                                 "fundamental estimation failed")

    K = np.asarray(K, np.float32)
    E = essential_from_fundamental(F, K, K)
    R, t, frac = recover_pose(E, a, b, K, np.asarray(inliers))
    R, t, frac = np.asarray(R, np.float64), np.asarray(t, np.float64), float(frac)

    # rotation validity: orthonormal with det +1 (stereo_calibration_yolo.py)
    ortho_err = np.abs(R @ R.T - np.eye(3)).max()
    if ortho_err > 1e-3 or abs(np.linalg.det(R) - 1.0) > 1e-3:
        return StereoCalibResult(False, None, None, n_matches, n_inliers, frac,
                                 "estimated rotation not a valid SO(3) matrix")
    if frac < min_cheirality:
        return StereoCalibResult(False, None, None, n_matches, n_inliers, frac,
                                 f"cheirality {frac:.2f} < {min_cheirality}")
    return StereoCalibResult(True, R, t, n_matches, n_inliers, frac)


def save_estimated_calibration(
    filepath: str, base_calib: Dict[str, np.ndarray], result: StereoCalibResult
):
    """KITTI-format calib writer with estimated R_stereo/t_stereo appended as
    comments (stereo_calibration_yolo.py:272-318)."""
    from sfa3d_tpu.geometry.calibration import save_calibration_kitti_format

    extra = {}
    if result.success:
        extra["R_stereo_estimated"] = result.R
        extra["t_stereo_estimated"] = result.t
    save_calibration_kitti_format(filepath, base_calib, extra)
