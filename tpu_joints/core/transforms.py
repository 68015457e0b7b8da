"""Rigid-pose math over padded clouds (SURVEY.md A4, A23, A25).

Replaces PCL's ``transformPointCloud`` (reference ``SHOT.cpp:515``),
``compute3DCentroid`` / ``computeCovarianceMatrixNormalized``
(``SHOT_demo.cpp:741-758``), ``getMinMax3D``, Umeyama SVD alignment (the pose
solver inside ``Hough3DGrouping`` and ``IterativeClosestPoint``), pose
composition chains (``SHOT_demo.cpp:604-663``), and quaternion→Euler with
±90° folding (``SHOT_demo.cpp:787-834``) — as pure ``jnp`` functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose math must hold mm-level accuracy on meter-scale scenes; TPU's default
# bf16 matmul passes do not. All matmuls here are tiny (3x3/4x4), so HIGHEST
# costs nothing.
_HI = jax.lax.Precision.HIGHEST

from tpu_joints.core.cloud import SENTINEL, Cloud


def transform_points(xyz: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to [..., 3] points."""
    return jnp.dot(xyz, T[:3, :3].T, precision=_HI) + T[:3, 3]


def transform_cloud(cloud: Cloud, T: jnp.ndarray) -> Cloud:
    xyz = transform_points(cloud.xyz, T)
    xyz = jnp.where(cloud.mask[:, None], xyz, SENTINEL)
    return Cloud(xyz=xyz, mask=cloud.mask, rgb=cloud.rgb)


def masked_centroid(xyz: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Centroid over valid points; [3]. Safe for empty masks."""
    w = mask.astype(xyz.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(xyz * w[:, None], axis=0) / denom


def masked_covariance(xyz: jnp.ndarray, mask: jnp.ndarray, centroid=None) -> jnp.ndarray:
    """Normalized 3x3 covariance over valid points (PCL-normalized: /count)."""
    if centroid is None:
        centroid = masked_centroid(xyz, mask)
    w = mask.astype(xyz.dtype)
    d = (xyz - centroid) * w[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.dot(d.T, d, precision=_HI) / denom


def masked_minmax(xyz: jnp.ndarray, mask: jnp.ndarray):
    """(min[3], max[3]) over valid points, PCL ``getMinMax3D`` equivalent."""
    big = jnp.asarray(SENTINEL, xyz.dtype)
    lo = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0)
    return lo, hi


def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted least-squares rigid transform T (4x4) with T @ src ≈ dst.

    The SVD (Kabsch/Umeyama, no scale) pose solver used by both Hough
    clustering and each ICP step in the reference's PCL internals.
    Degenerate inputs (all weights zero) return identity.
    """
    w = weights.astype(src.dtype)
    wsum = jnp.sum(w)
    safe = wsum > 1e-6
    denom = jnp.maximum(wsum, 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / denom
    mu_d = jnp.sum(dst * w[:, None], axis=0) / denom
    s = src - mu_s
    d = dst - mu_d
    cov = jnp.dot((d * w[:, None]).T, s, precision=_HI) / denom  # 3x3, maps src frame -> dst frame
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], src.dtype)).at[2, 2].set(jnp.sign(det))
    R = jnp.dot(jnp.dot(U, S, precision=_HI), Vt, precision=_HI)
    t = mu_d - R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return jnp.where(safe, T, jnp.eye(4, dtype=src.dtype))


def compose(*Ts: jnp.ndarray) -> jnp.ndarray:
    """Left-to-right application order: compose(A, B) applies B first, then A.

    Mirrors the reference's ``Final_pose = icp_T * hough_T``
    (``SHOT_segment.cpp:490``) and ``Full = icp2_T * Final * T_org``
    (``SHOT_demo.cpp:656``).
    """
    out = Ts[0]
    for T in Ts[1:]:
        out = jnp.dot(out, T, precision=_HI)
    return out


def invert_rigid(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    return Ti.at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ t)


def rotation_from_matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → quaternion [w, x, y, z], branch-free for jit."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)])
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)])
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)])
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz])
    cand = jnp.stack([q0, q1, q2, q3])
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11])
    idx = jnp.argmax(pivots)
    q = cand[idx]
    return q / jnp.linalg.norm(q)


def quaternion_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [w,x,y,z] → Euler roll/pitch/yaw (radians), ZYX convention.

    Same formulae the reference hand-codes at ``SHOT_demo.cpp:787-806``.
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw])


def fold_euler_90(euler: jnp.ndarray) -> jnp.ndarray:
    """±90° folding of Euler angles as in reference ``SHOT_demo.cpp:807-834``:
    angles are wrapped into [-90°, 90°] by adding/subtracting 180° — the
    joint's symmetry makes poses equivalent modulo half-turns about each axis.
    """
    half = jnp.pi / 2
    e = euler
    e = jnp.where(e > half, e - jnp.pi, e)
    e = jnp.where(e < -half, e + jnp.pi, e)
    return e


def rotation_geodesic_deg(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Angle between two rotations in degrees (test/eval metric)."""
    ctheta = (jnp.trace(jnp.dot(Ra.T, Rb, precision=_HI)) - 1.0) / 2.0
    return jnp.degrees(jnp.arccos(jnp.clip(ctheta, -1.0, 1.0)))


def cloud_resolution(xyz: jnp.ndarray, mask: jnp.ndarray, nn_dist_sq: jnp.ndarray) -> jnp.ndarray:
    """Mean nearest-neighbor distance over valid points (SURVEY.md A3).

    ``nn_dist_sq``: [N] squared distance to each point's nearest *other*
    valid neighbor (from ``neighbors.knn`` with k=2, column 1). Equivalent of
    the reference's ``computeCloudResolution`` (``SHOT.cpp:145-175``).
    """
    d = jnp.sqrt(jnp.maximum(nn_dist_sq, 0.0))
    w = mask.astype(d.dtype)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)
