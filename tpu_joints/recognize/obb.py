"""PCA oriented bounding box + Euler extraction (SURVEY.md A25).

Replaces the reference's hand-rolled OBB block (``SHOT_demo.cpp:741-834``,
``FPFH_scenes_clustered.cpp:929-1022``): centroid + normalized covariance →
eigenvectors (third axis = cross of the first two, as the reference does at
``SHOT_demo.cpp:757``), project points into the eigenbasis, min/max box,
then quaternion → Euler angles folded into ±90°.
"""
from __future__ import annotations

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
