"""Sample-consensus plane / cylinder segmentation (SURVEY.md A12).

Replaces PCL's ``SACSegmentationFromNormals`` as used by the reference
(``segmentation.cpp:80-125``: RANSAC plane with normal-distance weight 0.1,
100 iterations, distance 0.03; then cylinder with weight 0.1, 10000
iterations, distance 0.05, radius ≤ 0.1; also retained commented-out at
``6Dpose.cpp:287-387``).

TPU formulation: *vectorized RANSAC* — all hypotheses are sampled at once
with `jax.random`, scored against every point as one [H, N] masked
reduction (a couple of broadcast FMAs on the VPU), and the argmax hypothesis
wins. No loop over iterations at all; PCL's `max_iterations` becomes the
static hypothesis-batch size.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud


class SACResult(NamedTuple):
    """coefficients: plane [4] (n, d) with n·p + d = 0, or cylinder [7]
    (axis point, axis direction, radius) — PCL's coefficient layouts;
    inliers: bool[N]; score: int32 inlier count."""

    coefficients: jnp.ndarray
    inliers: jnp.ndarray
    score: jnp.ndarray


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


@functools.partial(
    jax.jit, static_argnames=("n_hypotheses", "distance_threshold",
                              "normal_distance_weight")
)
def sac_plane(
    cloud: Cloud,
    normals: jnp.ndarray,
    key: jax.Array,
    n_hypotheses: int = 256,
    distance_threshold: float = 0.03,
    normal_distance_weight: float = 0.1,
) -> SACResult:
    """RANSAC plane with normal agreement (PCL SACMODEL_NORMAL_PLANE).

    A point is an inlier when
      (1-w)·|point-plane distance| + w·(angular deviation · threshold-scale)
    stays under the distance threshold — PCL's combined metric with
    ``setNormalDistanceWeight(w)``.
    """
    N = cloud.capacity
    w = jnp.float32(normal_distance_weight)
    # sample 3 distinct-ish valid points per hypothesis (rejection-free:
    # probabilities proportional to the mask)
    p = cloud.mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, 3), p=p)
    a, b, c = (cloud.xyz[idx[:, i]] for i in range(3))
    n = _normalize(jnp.cross(b - a, c - a))  # [H, 3]
    d = -jnp.sum(n * a, axis=-1)  # [H]
    degenerate = jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1) < 1e-12

    dist = jnp.abs(cloud.xyz @ n.T + d[None, :])  # [N, H]
    cosang = jnp.abs(normals @ n.T)  # [N, H]
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    # PCL: weighted sum of euclidean distance and angular distance
    metric = (1.0 - w) * dist + w * ang * jnp.float32(distance_threshold)
    ok = (metric < distance_threshold) & cloud.mask[:, None]
    scores = jnp.sum(ok.astype(jnp.int32), axis=0)
    scores = jnp.where(degenerate, -1, scores)
    best = jnp.argmax(scores)
    coeff = jnp.concatenate([n[best], d[best][None]])
    return SACResult(coefficients=coeff, inliers=ok[:, best], score=scores[best])


@functools.partial(
    jax.jit, static_argnames=("n_hypotheses", "distance_threshold",
                              "normal_distance_weight", "radius_max")
)
def sac_cylinder(
    cloud: Cloud,
    normals: jnp.ndarray,
    key: jax.Array,
    n_hypotheses: int = 1024,
    distance_threshold: float = 0.05,
    normal_distance_weight: float = 0.1,
    radius_max: float = 0.1,
) -> SACResult:
    """RANSAC cylinder from two (point, normal) samples (PCL
    SACMODEL_CYLINDER): the axis is ⊥ both surface normals; the axis point
    and radius come from the closest approach of the two normal lines."""
    N = cloud.capacity
    w = jnp.float32(normal_distance_weight)
    p = cloud.mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, 2), p=p)
    p1, p2 = cloud.xyz[idx[:, 0]], cloud.xyz[idx[:, 1]]
    n1, n2 = normals[idx[:, 0]], normals[idx[:, 1]]

    axis = jnp.cross(n1, n2)
    axis_norm = jnp.linalg.norm(axis, axis=-1)
    degenerate = axis_norm < 1e-6
    axis = _normalize(jnp.where(degenerate[:, None], jnp.array([0.0, 0, 1.0]), axis))

    # closest points of lines (p1 - t·n1) and (p2 - s·n2)
    dp = p2 - p1
    a11 = jnp.sum(n1 * n1, -1)
    a12 = -jnp.sum(n1 * n2, -1)
    a22 = jnp.sum(n2 * n2, -1)
    b1 = -jnp.sum(dp * n1, -1)
    b2 = jnp.sum(dp * n2, -1)
    det = a11 * a22 - a12 * a12
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    t = (b1 * a22 - b2 * a12) / det_safe
    s = (a11 * b2 - a12 * b1) / det_safe
    q1 = p1 - t[:, None] * n1
    q2 = p2 - s[:, None] * n2
    center = 0.5 * (q1 + q2)  # [H, 3] axis point
    r1 = jnp.linalg.norm(jnp.cross(p1 - center, axis), axis=-1)
    r2 = jnp.linalg.norm(jnp.cross(p2 - center, axis), axis=-1)
    radius = 0.5 * (r1 + r2)
    degenerate = degenerate | (radius > radius_max) | (radius < 1e-6)

    def inlier_mask(cen, ax, rad):
        rel = cloud.xyz - cen  # [N, 3]
        radial = rel - jnp.sum(rel * ax, -1, keepdims=True) * ax
        dist_axis = jnp.linalg.norm(radial, axis=-1)
        dist = jnp.abs(dist_axis - rad)
        radial_dir = radial / jnp.maximum(dist_axis, 1e-12)[:, None]
        cosang = jnp.abs(jnp.sum(normals * radial_dir, -1))
        ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        metric = (1.0 - w) * dist + w * ang * jnp.float32(distance_threshold)
        return (metric < distance_threshold) & cloud.mask

    # score hypotheses in chunks so the [N, H] workspace stays small
    def score_one(args):
        cen, ax, rad = args
        return jnp.sum(inlier_mask(cen, ax, rad).astype(jnp.int32))

    scores = jax.lax.map(score_one, (center, axis, radius), batch_size=128)
    scores = jnp.where(degenerate, -1, scores)
    best = jnp.argmax(scores)
    coeff = jnp.concatenate([center[best], axis[best], radius[best][None]])
    return SACResult(
        coefficients=coeff,
        inliers=inlier_mask(center[best], axis[best], radius[best]),
        score=scores[best],
    )
