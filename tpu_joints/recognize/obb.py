"""PCA oriented bounding box + Euler extraction (SURVEY.md A25).

Replaces the reference's hand-rolled OBB block (``SHOT_demo.cpp:741-834``,
``FPFH_scenes_clustered.cpp:929-1022``): centroid + normalized covariance →
eigenvectors (third axis = cross of the first two, as the reference does at
``SHOT_demo.cpp:757``), project points into the eigenbasis, min/max box,
then quaternion → Euler angles folded into ±90°.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_joints.core.transforms import (
    fold_euler_90,
    masked_centroid,
    masked_covariance,
    masked_minmax,
    quaternion_to_euler,
    rotation_from_matrix_to_quaternion,
)
from tpu_joints.core.cloud import Cloud
from tpu_joints.features.eigen3 import eigh3x3

_HI = jax.lax.Precision.HIGHEST


class OBB(NamedTuple):
    """position: box center (world); rotation: float32[3,3] eigenbasis
    (columns = box axes); extents: full side lengths; euler: folded
    roll/pitch/yaw in radians; centroid: cloud mean."""

    position: jnp.ndarray
    rotation: jnp.ndarray
    extents: jnp.ndarray
    euler: jnp.ndarray
    centroid: jnp.ndarray


@jax.jit
def oriented_bounding_box(cloud: Cloud) -> OBB:
    centroid = masked_centroid(cloud.xyz, cloud.mask)
    cov = masked_covariance(cloud.xyz, cloud.mask, centroid)
    _, vecs = eigh3x3(cov)
    # reference: eigen_vectors.col(2) = col(0).cross(col(1))
    e0 = vecs[:, 0]
    e1 = vecs[:, 1]
    e2 = jnp.cross(e0, e1)
    R = jnp.stack([e0, e1, e2], axis=1)  # columns = axes
    local = jnp.dot(cloud.xyz - centroid, R, precision=_HI)
    lo, hi = masked_minmax(local, cloud.mask)
    mean_diag = 0.5 * (lo + hi)
    position = jnp.dot(R, mean_diag, precision=_HI) + centroid
    extents = hi - lo
    q = rotation_from_matrix_to_quaternion(R)
    euler = fold_euler_90(quaternion_to_euler(q))
    return OBB(position=position, rotation=R, extents=extents,
               euler=euler, centroid=centroid)


@functools.partial(
    jax.jit,
    static_argnames=("k", "smoothness_deg", "curvature_threshold",
                     "min_cluster_size"),
)
def oriented_bounding_box_clustered(
    cloud: Cloud,
    k: int = 30,
    smoothness_deg: float = 5.0,
    curvature_threshold: float = 5.0,
    min_cluster_size: int = 50,
) -> OBB:
    """OBB of the LARGEST smooth cluster of ``cloud`` — the reference's
    pre-step (``SHOT_demo.cpp:697-740``): it re-estimates k=30 normals on
    the aligned model, region-grows (smoothness 5°, curvature 5.0,
    min size 500), and fits the box to the dominant cluster only, so a
    partially-occluded or mis-trimmed alignment doesn't skew the box with
    stray points. PCL's ``extract`` yields the lowest-curvature-seed
    cluster first and the reference keeps ``j==0``; at joint geometry that
    is the dominant smooth cylinder body, which the size-argmax below
    selects deterministically (no seed-order dependence).

    Falls back to the whole cloud when no cluster reaches
    ``min_cluster_size`` (an all-edge alignment must still produce a box).
    """
    from tpu_joints.features.normals import estimate_normals
    from tpu_joints.segment.region_growing import region_growing

    normals, curvature = estimate_normals(cloud, k=k, allow_pallas=False)
    clusters = region_growing(
        cloud, normals, curvature, k=k,
        smoothness_deg=smoothness_deg,
        curvature_threshold=curvature_threshold,
        min_cluster_size=min_cluster_size,
    )
    # sizes is label-indexed; invalid labels carry 0 lanes ⇒ argmax is the
    # largest surviving cluster. Guard the no-cluster case with the mask.
    best_label = jnp.argmax(clusters.sizes)
    in_best = clusters.labels == best_label.astype(jnp.int32)
    has_cluster = jnp.any(in_best & cloud.mask)
    keep = jnp.where(has_cluster, in_best & cloud.mask, cloud.mask)
    return oriented_bounding_box(cloud.with_mask(keep))
