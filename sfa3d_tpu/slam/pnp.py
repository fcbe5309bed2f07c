"""RANSAC PnP camera-pose estimation, fully vectorized in JAX.

TPU-native replacement for the reference's cv2.solvePnP(EPNP + RANSAC
kwargs) call (msac.py:328-386): a fixed-iteration RANSAC where ALL
hypotheses are solved simultaneously as one batched 6-point DLT
(SVD of a (n_hyp, 12, 12) normal-matrix stack on device), inliers are
counted with a batched reprojection pass, and the winning hypothesis is
refined by a final DLT over its inliers. No data-dependent Python control
flow — the whole estimator jits.

Note (msac.py bug not replicated): the reference passes RANSAC kwargs to
plain `cv2.solvePnP`, which ignores them — its "RANSAC" never actually
RANSACs. Ours does.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _dlt_pose(pts3d: jax.Array, pts2d_norm: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted DLT for the 3x4 pose [R|t] from normalized image points.

    pts3d: (N, 3), pts2d_norm: (N, 2) (K^-1-normalized), weights: (N,).
    Returns (3, 4) with the rotation block projected onto SO(3) and the
    scale fixed so det(R) = 1.
    """
    n = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((n, 1))], axis=1)  # (N, 4)
    u = pts2d_norm[:, 0:1]
    v = pts2d_norm[:, 1:2]
    zeros = jnp.zeros((n, 4))
    # rows: [X 0 -u*X], [0 X -v*X]
    r1 = jnp.concatenate([X, zeros, -u * X], axis=1)  # (N, 12)
    r2 = jnp.concatenate([zeros, X, -v * X], axis=1)
    A = jnp.concatenate([r1 * weights[:, None], r2 * weights[:, None]], axis=0)
    # smallest right singular vector of A == eigvec of A^T A with min eigval
    ATA = A.T @ A  # (12, 12)
    eigvals, eigvecs = jnp.linalg.eigh(ATA)
    p = eigvecs[:, 0].reshape(3, 4)
    # fix scale+sign: ||r3|| = 1, cheirality via points in front
    Rraw = p[:, :3]
    scale = jnp.linalg.norm(Rraw[2])
    p = p / jnp.maximum(scale, 1e-12)
    depth = pts3d @ p[2, :3] + p[2, 3]
    sign = jnp.where(jnp.sum(jnp.sign(depth) * weights) >= 0, 1.0, -1.0)
    p = p * sign
    # project rotation block onto SO(3)
    U, _, Vt = jnp.linalg.svd(p[:, :3])
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.linalg.det(U @ Vt)]))
    R = U @ D @ Vt
    # rescale translation consistently with the orthonormalized R
    s = jnp.sum(p[:, :3] * R) / 3.0  # average scale along R
    t = p[:, 3] / jnp.maximum(s, 1e-12)
    return jnp.concatenate([R, t[:, None]], axis=1)


def _reproject_error(pose: jax.Array, pts3d: jax.Array, pts2d: jax.Array, K: jax.Array):
    """Pixel reprojection error per point for pose (3,4)."""
    cam = pts3d @ pose[:, :3].T + pose[:, 3]
    uvw = cam @ K.T
    uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-9)
    err = jnp.linalg.norm(uv - pts2d, axis=-1)
    behind = cam[:, 2] <= 0
    return jnp.where(behind, 1e9, err)


@functools.partial(jax.jit, static_argnames=("iterations", "sample_size"))
def ransac_pnp(
    pts3d: jax.Array,
    pts2d: jax.Array,
    K: jax.Array,
    valid: jax.Array,
    rng: jax.Array,
    *,
    reprojection_error: float = 8.0,
    iterations: int = 128,
    sample_size: int = 6,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Estimate the camera pose from padded 3D<->2D correspondences.

    Args:
      pts3d: (N, 3) world points; pts2d: (N, 2) pixels; K: (3, 3) intrinsics;
      valid: (N,) padding mask; rng: jax PRNG key.

    Returns (pose (3, 4) [R|t], inlier mask (N,), n_inliers scalar).
    """
    n = pts3d.shape[0]
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((n, 1))
    norm = (jnp.concatenate([pts2d, ones], axis=1) @ Kinv.T)[:, :2]

    # all hypothesis samples at once: (iters, sample_size) indices over valid
    # slots; each minimal set drawn WITHOUT replacement (duplicates would
    # under-determine the DLT solve and waste the hypothesis, like cv2's
    # RANSAC never does)
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(sample_size,), replace=False, p=probs)
    )(jax.random.split(rng, iterations))

    def hypothesis(sample_idx):
        w = jnp.zeros((n,)).at[sample_idx].set(1.0) * valid
        return _dlt_pose(pts3d, norm, w)

    poses = jax.vmap(hypothesis)(idx)  # (iters, 3, 4)
    errs = jax.vmap(lambda p: _reproject_error(p, pts3d, pts2d, K))(poses)
    inlier_masks = (errs < reprojection_error) & valid[None, :]
    counts = inlier_masks.sum(axis=1)
    best = jnp.argmax(counts)

    # refine on the winning inlier set
    best_mask = inlier_masks[best]
    refined = _dlt_pose(pts3d, norm, best_mask.astype(jnp.float32))
    ref_err = _reproject_error(refined, pts3d, pts2d, K)
    ref_mask = (ref_err < reprojection_error) & valid
    # keep the refinement only if it does not lose inliers
    use_refined = ref_mask.sum() >= counts[best]
    pose = jnp.where(use_refined, refined, poses[best])
    mask = jnp.where(use_refined, ref_mask, best_mask)
    return pose, mask, mask.sum()


def rodrigues(rvec):
    """Axis-angle -> rotation matrix (cv2.Rodrigues parity, jittable)."""
    rvec = jnp.asarray(rvec, jnp.float32).reshape(3)
    theta = jnp.linalg.norm(rvec)
    k = rvec / jnp.maximum(theta, 1e-12)
    Kx = jnp.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], jnp.float32
    )
    R = (
        jnp.eye(3)
        + jnp.sin(theta) * Kx
        + (1 - jnp.cos(theta)) * (Kx @ Kx)
    )
    return jnp.where(theta < 1e-8, jnp.eye(3), R)
