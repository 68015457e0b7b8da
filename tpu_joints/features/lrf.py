"""Local reference frames (SURVEY.md A15 internals + A18).

``shot_lrf`` is the SHOT local reference frame (Tombari et al.; PCL's
``SHOTLocalReferenceFrameEstimation``, used implicitly by
``SHOTEstimationOMP`` at reference ``SHOT.cpp:358-371``): a distance-weighted
covariance eigenbasis with majority-vote sign disambiguation.

``board_lrf`` plays the role of PCL's ``BOARDLocalReferenceFrameEstimation``
(reference ``SHOT.cpp:441-453``), which feeds Hough voting. BOARD's full
border-aware x-axis vote is built around scan-border hole detection; here the
z-axis is the support plane normal (oriented by the point normal) and the
x-axis is the in-plane direction of the farthest support point — capturing
BOARD's intent (repeatable frames on partially visible surfaces) in a
vectorizable form. Hough grouping defaults to ``shot_lrf`` for both model and
scene, which preserves the reference pipeline's behavior: all that matters to
voting is that frames are repeatable across the two clouds.

Frames are returned as float32[M, 3, 3] with *rows* = (x, y, z) axes, so
``local = rf @ (p_world - keypoint)``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.features.eigen3 import eigh3x3

_HI = jax.lax.Precision.HIGHEST


def _disambiguate(axis: jnp.ndarray, rel: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Flip ``axis`` [M,3] so the (weighted) majority of support offsets
    ``rel`` [M,K,3] points along it; ties break on the dot-product sum."""
    dots = jnp.einsum("mki,mi->mk", rel, axis)
    pos = jnp.sum((dots >= 0) * w, axis=1)
    neg = jnp.sum((dots < 0) * w, axis=1)
    ssum = jnp.sum(dots * w, axis=1)
    flip = jnp.where(pos == neg, ssum < 0, neg > pos)
    return jnp.where(flip[:, None], -axis, axis)


def shot_lrf(
    key_xyz: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_valid: jnp.ndarray,
    radius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SHOT local reference frames.

    Args:
      key_xyz:   [M, 3] keypoints.
      nbr_xyz:   [M, K, 3] gathered support points (padded).
      nbr_valid: [M, K] support validity (within radius and real).
      radius: support radius (weights are radius - distance).

    Returns:
      (rf float32[M, 3, 3] rows x/y/z, ok bool[M] — frame well-defined).
    """
    rel = nbr_xyz - key_xyz[:, None, :]  # [M, K, 3]
    d = jnp.linalg.norm(rel, axis=-1)
    w = jnp.maximum(jnp.float32(radius) - d, 0.0) * nbr_valid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    relw = rel * w[..., None]
    cov = jnp.einsum("mki,mkj->mij", relw, rel, precision=_HI) / wsum[:, None, None]
    vals, vecs = eigh3x3(cov)
    x_axis = vecs[..., :, 0]  # largest-variance direction
    z_axis = vecs[..., :, 2]  # smallest
    x_axis = _disambiguate(x_axis, rel, w)
    z_axis = _disambiguate(z_axis, rel, w)
    y_axis = jnp.cross(z_axis, x_axis)
    rf = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # rows
    ok = jnp.sum(nbr_valid, axis=1) >= 5
    return rf, ok


def board_lrf(
    key_xyz: jnp.ndarray,
    key_normal: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_valid: jnp.ndarray,
    radius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BOARD-style local reference frames (see module docstring).

    z = support-plane normal oriented along the point normal; x = in-plane
    direction toward the farthest valid support point; y = z × x.
    """
    rel = nbr_xyz - key_xyz[:, None, :]
    d = jnp.linalg.norm(rel, axis=-1)
    w = jnp.maximum(jnp.float32(radius) - d, 0.0) * nbr_valid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    mean = jnp.sum(rel * w[..., None], axis=1) / wsum[:, None]
    cen = (rel - mean[:, None, :]) * nbr_valid[..., None]
    cov = jnp.einsum("mki,mkj->mij", cen * w[..., None], cen, precision=_HI)
    _, vecs = eigh3x3(cov)
    z_axis = vecs[..., :, 2]
    # orient along the precomputed surface normal
    flip = jnp.sum(z_axis * key_normal, axis=-1) < 0
    z_axis = jnp.where(flip[:, None], -z_axis, z_axis)
    # farthest in-plane support direction
    d_masked = jnp.where(nbr_valid, d, -1.0)
    far = jnp.argmax(d_masked, axis=1)
    far_rel = jnp.take_along_axis(rel, far[:, None, None], axis=1)[:, 0, :]
    x_axis = far_rel - jnp.sum(far_rel * z_axis, -1, keepdims=True) * z_axis
    xn = jnp.linalg.norm(x_axis, axis=-1, keepdims=True)
    # degenerate fallback: any vector orthogonal to z
    alt = jnp.cross(z_axis, jnp.array([0.0, 0.0, 1.0], jnp.float32))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(z_axis, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    alt = jnp.where(alt_n > 1e-6, alt / jnp.maximum(alt_n, 1e-12),
                    alt2 / jnp.maximum(jnp.linalg.norm(alt2, axis=-1, keepdims=True), 1e-12))
    x_axis = jnp.where(xn[:, 0:1] > 1e-8, x_axis / jnp.maximum(xn, 1e-12), alt)
    y_axis = jnp.cross(z_axis, x_axis)
    rf = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    ok = jnp.sum(nbr_valid, axis=1) >= 3
    return rf, ok
