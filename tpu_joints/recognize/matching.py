"""Descriptor nearest-neighbor matching (SURVEY.md A19).

Replaces the reference's FLANN kd-tree loops over scene descriptors:

* 1-NN with an absolute squared-distance gate (< 0.20 at ``SHOT.cpp:405-423``,
  < 0.25 at ``SHOT_segment.cpp:357-371``);
* 2-NN Lowe-style ratio gate τ = d1/d2 (≤ 1 at ``SHOT_demo.cpp:513-530``,
  ``FPFH_demo.cpp:521-538``).

Both are one tiled [M_scene × N_model] distance computation on the MXU
(the 352-wide contraction is genuinely matmul-shaped) + top-k, via
``neighbors.knn``. Correspondences keep the reference's orientation:
for each *scene* keypoint, its nearest *model* keypoint.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_joints.neighbors import knn


class Correspondences(NamedTuple):
    """Per-scene-keypoint matches into the model keypoint set.

    model_idx: int32[M] nearest model keypoint; valid: bool[M] gate passed;
    dist_sq: float32[M] squared descriptor distance.
    """

    model_idx: jnp.ndarray
    valid: jnp.ndarray
    dist_sq: jnp.ndarray

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("max_dist_sq",))
def match_nn(
    scene_desc: jnp.ndarray,
    scene_valid: jnp.ndarray,
    model_desc: jnp.ndarray,
    model_valid: jnp.ndarray,
    max_dist_sq: float = 0.25,
) -> Correspondences:
    """1-NN matching with an absolute squared-distance gate."""
    d, i = knn(scene_desc, model_desc, 1, source_mask=model_valid, chunk=512)
    ok = scene_valid & (d[:, 0] < max_dist_sq)
    return Correspondences(model_idx=i[:, 0], valid=ok, dist_sq=d[:, 0])


@functools.partial(jax.jit, static_argnames=("ratio",))
def match_ratio(
    scene_desc: jnp.ndarray,
    scene_valid: jnp.ndarray,
    model_desc: jnp.ndarray,
    model_valid: jnp.ndarray,
    ratio: float = 1.0,
) -> Correspondences:
    """2-NN ratio-test matching: accept when d1/d2 ≤ ratio.

    The reference uses τ ≤ 1 (i.e. accept-all unless d2 is 0-information;
    ``SHOT_demo.cpp:522-524``), so the default matches that behavior while
    smaller τ values enable genuine Lowe filtering.
    """
    d, i = knn(scene_desc, model_desc, 2, source_mask=model_valid, chunk=512)
    d1, d2 = d[:, 0], d[:, 1]
    ok = scene_valid & (d1 <= ratio * ratio * jnp.maximum(d2, 1e-20)) & (d2 < 1e30)
    return Correspondences(model_idx=i[:, 0], valid=ok, dist_sq=d1)
