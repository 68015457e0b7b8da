"""Centroid-offset edge detector (SURVEY.md A14).

Re-implements the reference's hand-rolled edge detector
(``Edge_detection.cpp:108-149``): for each point take its k nearest
neighbors, compute their centroid, and flag the point as an edge when the
L1 offset |centroid - point| exceeds a threshold on any axis — interior
points sit at the middle of their neighborhood; border points do not.
The reference's O(N·k) kd-tree loop becomes one batched kNN + reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.neighbors import knn


@functools.partial(jax.jit, static_argnames=("k", "threshold"))
def detect_edges(cloud: Cloud, k: int = 100, threshold: float = 0.004) -> jnp.ndarray:
    """bool[N]: True where the point is an edge (reference gate 0.004,
    ``Edge_detection.cpp:136-145``; k=100 at ``:116-120``)."""
    d, idx = knn(cloud.xyz, cloud.xyz, k, source_mask=cloud.mask)
    valid = (d < 1e30) & cloud.mask[:, None]
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    centroid = jnp.sum(cloud.xyz[idx] * w[..., None], axis=1) / cnt[:, None]
    offset = jnp.abs(centroid - cloud.xyz)
    is_edge = jnp.any(offset > threshold, axis=-1)
    return is_edge & cloud.mask
