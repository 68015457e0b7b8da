"""PCA surface-normal + curvature estimation (SURVEY.md A9).

Replaces PCL's ``NormalEstimation(OMP)`` (reference ``SHOT.cpp:302-308``,
``FPFH_scenes_clustered.cpp:273-279``): gather each point's neighborhood
(kNN or radius), form the 3x3 covariance, take the smallest-eigenvalue
eigenvector (closed form, batched), orient toward the viewpoint, and report
PCL's surface-change curvature λ0 / (λ0 + λ1 + λ2).

The OpenMP parallelism of the reference becomes trivial data parallelism:
every point's eigensolve is an elementwise formula over an [N, 3, 3] batch.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.features.eigen3 import smallest_eigenvector
from tpu_joints.neighbors import knn, radius_neighbors


def _normals_from_neighborhoods(
    xyz: jnp.ndarray,
    idx: jnp.ndarray,
    nvalid: jnp.ndarray,
    mask: jnp.ndarray,
    viewpoint: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core: [N, K] padded neighbor indices → (normals [N,3], curvature [N])."""
    nbr = xyz[idx]  # [N, K, 3]
    w = nvalid.astype(xyz.dtype)  # [N, K]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # [N]
    mean = jnp.sum(nbr * w[..., None], axis=1) / cnt[:, None]
    d = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d,
                 precision=jax.lax.Precision.HIGHEST) / cnt[:, None, None]
    normal, vals = smallest_eigenvector(cov)
    # Orient toward viewpoint (PCL flipNormalTowardsViewpoint).
    to_vp = viewpoint[None, :] - xyz
    flip = jnp.sum(normal * to_vp, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    total = jnp.maximum(vals[..., 0] + vals[..., 1] + vals[..., 2], 1e-12)
    curvature = jnp.maximum(vals[..., 2], 0.0) / total
    ok = mask & (jnp.sum(nvalid, axis=1) >= 3)
    normal = jnp.where(ok[:, None], normal, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return normal, curvature


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(
    cloud: Cloud,
    k: int = 40,
    viewpoint: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN-support normals, the reference's dominant mode (k = 10..100).

    Returns (normals float32[N, 3], curvature float32[N]).
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    d, idx = knn(cloud.xyz, cloud.xyz, k, source_mask=cloud.mask)
    nvalid = (d < 1e30) & cloud.mask[:, None]
    return _normals_from_neighborhoods(cloud.xyz, idx, nvalid, cloud.mask, viewpoint)


@functools.partial(jax.jit, static_argnames=("radius", "k_max"))
def estimate_normals_radius(
    cloud: Cloud,
    radius: float,
    k_max: int = 64,
    viewpoint: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius-support normals (reference ``FPFH_demo.cpp:405-428`` uses
    ``setRadiusSearch(0.15)``)."""
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    idx, valid, _ = radius_neighbors(cloud.xyz, cloud.xyz, radius, k_max,
                                     source_mask=cloud.mask)
    nvalid = valid & cloud.mask[:, None]
    return _normals_from_neighborhoods(cloud.xyz, idx, nvalid, cloud.mask, viewpoint)
