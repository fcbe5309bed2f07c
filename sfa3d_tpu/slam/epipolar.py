"""Epipolar geometry in JAX: fundamental/essential estimation, pose
recovery, triangulation.

TPU-native replacement for the reference's cv2.findFundamentalMat(FM_RANSAC)
-> cv2.findEssentialMat -> cv2.recoverPose chain
(stereo_calibration_yolo.py:121-270): normalized 8-point solves for every
RANSAC hypothesis batched into one SVD stack, Sampson-distance inlier
scoring, E = K2^T F K1, SVD pose decomposition with the 4-candidate
cheirality test via batched DLT triangulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _normalize_points(pts: jax.Array, weights: jax.Array):
    """Hartley normalization: zero-mean, mean distance sqrt(2)."""
    wsum = jnp.maximum(weights.sum(), 1.0)
    mean = (pts * weights[:, None]).sum(0) / wsum
    d = jnp.linalg.norm(pts - mean, axis=1)
    scale = jnp.sqrt(2.0) / jnp.maximum((d * weights).sum() / wsum, 1e-9)
    T = jnp.array(
        [[scale, 0, -scale * mean[0]], [0, scale, -scale * mean[1]], [0, 0, 1]]
    )
    return (pts - mean) * scale, T


def _eight_point(p1: jax.Array, p2: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted normalized 8-point fundamental matrix; (N,2)+(N,2) -> (3,3)."""
    n1, T1 = _normalize_points(p1, weights)
    n2, T2 = _normalize_points(p2, weights)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1)
    A = A * weights[:, None]
    _, eigvecs = jnp.linalg.eigh(A.T @ A)
    F = eigvecs[:, 0].reshape(3, 3)
    # rank-2 enforcement
    U, S, Vt = jnp.linalg.svd(F)
    F = U @ jnp.diag(S.at[2].set(0.0)) @ Vt
    F = T2.T @ F @ T1
    return F / jnp.where(jnp.abs(F[2, 2]) > 1e-12, F[2, 2], 1.0)


def sampson_distance(F: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """First-order epipolar error per correspondence."""
    ones = jnp.ones((p1.shape[0], 1))
    x1 = jnp.concatenate([p1, ones], axis=1)
    x2 = jnp.concatenate([p2, ones], axis=1)
    Fx1 = x1 @ F.T
    Ftx2 = x2 @ F
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("iterations", "sample_size"))
def estimate_fundamental_ransac(
    p1: jax.Array,
    p2: jax.Array,
    valid: jax.Array,
    rng: jax.Array,
    *,
    threshold: float = 3.0,
    iterations: int = 256,
    sample_size: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """(N,2)x(N,2) padded matches -> (F (3,3), inlier mask (N,)).
    cv2.findFundamentalMat(FM_RANSAC, 3.0, .99) analog with fixed iteration
    count (deterministic compile shape)."""
    n = p1.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    # minimal sets are drawn WITHOUT replacement (like cv2's RANSAC): a
    # duplicate index collapses the 8-point solve to <8 distinct
    # constraints, whose 2-D null space yields an arbitrary F — with
    # replacement ~25-45% of hypotheses were wasted at n=50-100
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(sample_size,), replace=False, p=probs)
    )(jax.random.split(rng, iterations))

    def hypothesis(sample_idx):
        w = jnp.zeros((n,)).at[sample_idx].set(1.0) * valid
        return _eight_point(p1, p2, w)

    Fs = jax.vmap(hypothesis)(idx)
    d = jax.vmap(lambda F: sampson_distance(F, p1, p2))(Fs)
    masks = (d < threshold**2) & valid[None, :]
    best = jnp.argmax(masks.sum(axis=1))
    # final solve on the winning inliers
    F = _eight_point(p1, p2, masks[best].astype(jnp.float32))
    mask = (sampson_distance(F, p1, p2) < threshold**2) & valid
    keep = mask.sum() >= masks[best].sum()
    return jnp.where(keep, F, Fs[best]), jnp.where(keep, mask, masks[best])


def essential_from_fundamental(F: jax.Array, K1: jax.Array, K2: jax.Array) -> jax.Array:
    """E = K2^T F K1 with the (1,1,0) singular-value projection."""
    E = K2.T @ F @ K1
    U, _, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt


def triangulate_points(P1: jax.Array, P2: jax.Array, p1: jax.Array, p2: jax.Array):
    """Batched DLT triangulation: (3,4)x2 projections + (N,2)x2 pixels ->
    (N,3) world points."""

    def one(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, eigvecs = jnp.linalg.eigh(A.T @ A)
        X = eigvecs[:, 0]
        # sign-preserving clamp: replacing a tiny NEGATIVE X[3] with +eps
        # would flip the point across both cameras and corrupt cheirality
        # votes for near-infinity geometry
        eps = jnp.where(X[3] < 0, -1e-12, 1e-12)
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], eps)

    return jax.vmap(one)(p1, p2)


@jax.jit
def recover_pose(
    E: jax.Array, p1: jax.Array, p2: jax.Array, K: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """cv2.recoverPose analog: choose among the 4 (R, t) decompositions of E
    by the cheirality count (triangulated depth positive in both cameras).
    Returns (R (3,3), t (3,) unit, cheirality fraction in [0,1])."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]

    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((p1.shape[0], 1))
    n1 = (jnp.concatenate([p1, ones], 1) @ Kinv.T)[:, :2]
    n2 = (jnp.concatenate([p2, ones], 1) @ Kinv.T)[:, :2]
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def cheirality(R, tt):
        P2 = jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate_points(P1, P2, n1, n2)
        z1 = X[:, 2]
        z2 = X @ R[2] + tt[2]
        good = (z1 > 0) & (z2 > 0) & valid
        return good.sum()

    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])
    scores = jax.vmap(cheirality)(cands_R, cands_t)
    best = jnp.argmax(scores)
    frac = scores[best] / jnp.maximum(valid.sum(), 1)
    return cands_R[best], cands_t[best], frac
