"""Multi-scale normal-variance descriptor (SURVEY.md A17).

Re-implements the reference's custom descriptor (``SHOT_VAR.cpp:335-483``):
for each keypoint, at three radii r·(u+1) for u ∈ {0, 1, 2}, gather the
radius neighborhood, compute θ_i = angle between the keypoint normal and
each neighbor normal, and store the *variance* of θ over the neighborhood.
Keypoints with an empty neighborhood at a scale store -1 at that scale
(the reference writes -1 sentinel rows, ``SHOT_VAR.cpp:447-456``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.neighbors import radius_neighbors

N_SCALES = 3


@functools.partial(jax.jit, static_argnames=("radius", "k_max"))
def compute_variance_descriptor(
    keypoints: Cloud,
    keypoint_normals: jnp.ndarray,
    surface: Cloud,
    surface_normals: jnp.ndarray,
    radius: float,
    k_max: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (desc float32[M, 3] of θ-variances, valid bool[M])."""
    descs = []
    for u in range(N_SCALES):
        r = radius * (u + 1)
        idx, within, _ = radius_neighbors(
            keypoints.xyz, surface.xyz, r, k_max, source_mask=surface.mask
        )
        valid = within & keypoints.mask[:, None]
        nnrm = surface_normals[idx]
        cos = jnp.einsum("mkj,mj->mk", nnrm, keypoint_normals)
        theta = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
        w = valid.astype(jnp.float32)
        cnt = jnp.sum(w, axis=1)
        safe = jnp.maximum(cnt, 1.0)
        mean = jnp.sum(theta * w, axis=1) / safe
        var = jnp.sum((theta - mean[:, None]) ** 2 * w, axis=1) / safe
        descs.append(jnp.where(cnt > 0, var, -1.0))
    desc = jnp.stack(descs, axis=-1)
    return desc, keypoints.mask
