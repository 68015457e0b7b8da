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
    query_xyz: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core: [M, K] padded neighbor indices into ``xyz`` → (normals [M,3],
    curvature [M]); ``query_xyz`` defaults to ``xyz`` (self-neighborhoods)."""
    if query_xyz is None:
        query_xyz = xyz
    nbr = xyz[idx]  # [M, K, 3]
    w = nvalid.astype(xyz.dtype)  # [N, K]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # [N]
    mean = jnp.sum(nbr * w[..., None], axis=1) / cnt[:, None]
    d = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d,
                 precision=jax.lax.Precision.HIGHEST) / cnt[:, None, None]
    normal, vals = smallest_eigenvector(cov)
    # Orient toward viewpoint (PCL flipNormalTowardsViewpoint).
    to_vp = viewpoint[None, :] - query_xyz
    flip = jnp.sum(normal * to_vp, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    total = jnp.maximum(vals[..., 0] + vals[..., 1] + vals[..., 2], 1e-12)
    curvature = jnp.maximum(vals[..., 2], 0.0) / total
    ok = mask & (jnp.sum(nvalid, axis=1) >= 3)
    normal = jnp.where(ok[:, None], normal, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return normal, curvature


@functools.partial(jax.jit, static_argnames=("k", "allow_pallas"))
def estimate_normals(
    cloud: Cloud,
    k: int = 40,
    viewpoint: Optional[jnp.ndarray] = None,
    allow_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN-support normals, the reference's dominant mode (k = 10..100).

    Returns (normals float32[N, 3], curvature float32[N]).
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    d, idx = knn(cloud.xyz, cloud.xyz, k, source_mask=cloud.mask,
                 allow_pallas=allow_pallas)
    nvalid = (d < 1e30) & cloud.mask[:, None]
    return _normals_from_neighborhoods(cloud.xyz, idx, nvalid, cloud.mask, viewpoint)


@functools.partial(jax.jit, static_argnames=("k", "anchors"))
def estimate_normals_anchored(
    cloud: Cloud,
    k: int = 16,
    anchors: int = 8192,
    viewpoint: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normals via an anchor subsample + nearest-anchor propagation.

    For big clouds the all-pairs kNN is the pipeline's dominant cost and its
    output is smooth over the surface; computing exact kNN normals at an
    ``anchors``-point stride subsample and propagating each point's normal
    from its nearest anchor (one cheap k=1 NN — the Pallas fast path) cuts
    the NN work ~N/anchors× at sub-voxel-scale smoothing, which the
    curvature/descriptor consumers tolerate (they already smooth over k-NN
    supports). Exact behavior is recovered with ``anchors >= capacity``.
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    N = cloud.capacity
    if anchors >= N:
        return estimate_normals(cloud, k=k, viewpoint=viewpoint)
    a_idx = jnp.linspace(0, N - 1, anchors).astype(jnp.int32)
    a_xyz = cloud.xyz[a_idx]
    a_mask = cloud.mask[a_idx]
    # allow_pallas=False (like the propagation call below): with the
    # default _PALLAS_MAXK=32 this anchor kNN would otherwise put a second
    # Mosaic program into the prepare executable alternating with the ICP
    # k=1 kernel — the A,B,A re-execution fault (docs/PERFORMANCE.md)
    d, idx = knn(a_xyz, cloud.xyz, k, source_mask=cloud.mask,
                 allow_pallas=False)
    nvalid = (d < 1e30) & a_mask[:, None]
    a_normals, a_curv = _normals_from_neighborhoods(
        cloud.xyz, idx, nvalid, a_mask, viewpoint, query_xyz=a_xyz
    )
    # XLA path (not Pallas): keeps the feature-extraction executable free of
    # Mosaic kernels, which the current TPU runtime requires when another
    # executable (the ICP stage) already carries one
    d1, nn1 = knn(cloud.xyz, a_xyz, 1, source_mask=a_mask, allow_pallas=False)
    nearest = nn1[:, 0]
    ok = cloud.mask & (d1[:, 0] < 1e30)
    normals = jnp.where(ok[:, None], a_normals[nearest], 0.0)
    curv = jnp.where(ok, a_curv[nearest], 0.0)
    return normals, curv


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
