"""ISS 3D keypoint detector (SURVEY.md A13 — optional parity feature).

The reference carries ISS as a commented-out alternative keypoint stage
(``SHOT.cpp:329-352``, ``CAD_desc.cpp:310-334``). Implemented here for
parity: eigenvalue-ratio saliency over the radius-support scatter matrix
plus non-maximum suppression on the smallest eigenvalue.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.features.eigen3 import eigvals3x3
from tpu_joints.neighbors import radius_neighbors

_HI = jax.lax.Precision.HIGHEST


@functools.partial(
    jax.jit, static_argnames=("salient_radius", "non_max_radius", "k_max")
)
def iss_keypoints(
    cloud: Cloud,
    salient_radius: float,
    non_max_radius: float,
    gamma_21: float = 0.975,
    gamma_32: float = 0.975,
    min_neighbors: int = 5,
    k_max: int = 64,
) -> jnp.ndarray:
    """bool[N] keypoint mask (PCL ``ISSKeypoint3D`` defaults γ=0.975,
    reference ``SHOT.cpp:336-344``)."""
    idx, within, _ = radius_neighbors(
        cloud.xyz, cloud.xyz, salient_radius, k_max,
        source_mask=cloud.mask, exclude_self=True,
    )
    valid = within & cloud.mask[:, None]
    w = valid.astype(jnp.float32)
    cnt = jnp.sum(w, axis=1)
    rel = (cloud.xyz[idx] - cloud.xyz[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", rel, rel, precision=_HI) / jnp.maximum(
        cnt, 1.0
    )[:, None, None]
    vals = eigvals3x3(cov)  # descending
    l1, l2, l3 = vals[..., 0], vals[..., 1], vals[..., 2]
    salient = (
        (l2 / jnp.maximum(l1, 1e-12) < gamma_21)
        & (l3 / jnp.maximum(l2, 1e-12) < gamma_32)
        & (l3 > 0)
        & (cnt >= min_neighbors)
        & cloud.mask
    )
    # non-max suppression on l3 within non_max_radius
    nidx, nwithin, _ = radius_neighbors(
        cloud.xyz, cloud.xyz, non_max_radius, k_max,
        source_mask=cloud.mask, exclude_self=True,
    )
    nvalid = nwithin & cloud.mask[:, None]
    nbr_l3 = jnp.where(nvalid & salient[nidx], l3[nidx], -jnp.inf)
    is_max = l3 >= jnp.max(nbr_l3, axis=1)
    return salient & is_max
