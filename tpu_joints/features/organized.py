"""Organized-cloud normals via box-filtered moment maps (SURVEY.md A9 fast path).

The reference's real input is an organized 640×480 depth-sensor cloud
(``ROS_server.cpp:2138``: datalen = resol_x·resol_y; ``crop_pcd.cpp:76-77``),
yet every driver runs k-NN normal estimation over the unordered point set
(``SHOT.cpp:302-308``) — paying a neighbor search the sensor grid already
answers. PCL's own organized path (``IntegralImageNormalEstimation``,
COVARIANCE_MATRIX mode) replaces the search with summed-area tables; this
module replicates that design with a TPU-critical twist: moment *planes*.

Two layout/precision lessons drive the implementation (measured on v5e):

- **Channel-first planes, never trailing small dims.** TPU arrays tile
  (8, 128) over the last two axes; a [H, W, 10] moment image wastes 92% of
  every lane group and made the SAT version ~10× slower than the same math
  on [10, H, W] planes whose lane axis is W = 640.
- **Box filters, not summed-area tables.** f32 SATs over 307k pixels carry
  ~2^18 of magnitude into the 4-corner difference, which is the same order
  as the (mm²-scale) covariance entries being extracted — the smallest
  eigenvector becomes noise on low-curvature surfaces. Separable
  ``lax.reduce_window`` box sums only ever add (2r+1)² ≤ 121 values, so
  they stay exact to ~2^-17 relative, and at stride 1 on [10, H, W] they
  stream at HBM bandwidth (~1 ms for the full pyramid at 640×480).

Per pixel: the covariance of the valid points in a (2r+1)² window is
assembled from window sums of (count, x, y, z, xx, xy, xz, yy, yz, zz);
its smallest eigenvector (closed-form ``eigh3x3``) is the normal, oriented
toward the viewpoint; curvature = λ0 / (λ0+λ1+λ2) exactly as the k-NN
estimator defines it.

Depth discontinuities: like PCL (setMaxDepthChangeFactor + its smoothing
size map), the window shrinks per pixel to stay clear of depth edges — a
depth-change map (3×3 z-range over ``depth_change`` among *valid* pixels)
is dilated ``half_window`` times (``lax.reduce_window`` max stencils) to
get each pixel's Chebyshev distance to the nearest change, and the moment
lookup uses that per-pixel radius. Invalid pixels are excluded by the
count channel rather than treated as edges, so silhouettes against empty
background keep their (one-sided) windows — those rim points carry real
pose information for ICP and SHOT support. Pixels whose window collapses
onto a valid-valid depth edge, or that gather < 5 points, are reported
invalid (PCL's NaN-at-edges behavior).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_joints.features.eigen3 import eigh3x3


def _box_sums(planes: jnp.ndarray, r: int) -> jnp.ndarray:
    """Separable (2r+1)² box sum of [C, H, W] planes, SAME padding."""
    if r == 0:
        return planes
    s = jax.lax.reduce_window(planes, 0.0, jax.lax.add,
                              (1, 2 * r + 1, 1), (1, 1, 1), "SAME")
    return jax.lax.reduce_window(s, 0.0, jax.lax.add,
                                 (1, 1, 2 * r + 1), (1, 1, 1), "SAME")


def _safe_radius(z: jnp.ndarray, valid: jnp.ndarray, r: int,
                 depth_change: float) -> jnp.ndarray:
    """Per-pixel Chebyshev distance (−1, capped at r) to the nearest
    valid-valid depth change — PCL's smoothing-size map.

    Invalid pixels do NOT count as changes (the count channel masks them out
    of the moments); only a z-jump between two valid pixels shrinks the
    window, so object rims against empty background keep full support.
    """
    big = jnp.float32(3.0e38)
    zmax = jax.lax.reduce_window(jnp.where(valid, z, -big), -big, jax.lax.max,
                                 (3, 3), (1, 1), "SAME")
    zmin = jax.lax.reduce_window(jnp.where(valid, z, big), big, jax.lax.min,
                                 (3, 3), (1, 1), "SAME")
    change = zmax - zmin > jnp.float32(depth_change)
    dist = jnp.where(change, 0, r + 1).astype(jnp.int32)
    reach = change.astype(jnp.float32)
    for s in range(1, r + 1):
        reach = jax.lax.reduce_window(reach, 0.0, jax.lax.max, (3, 3), (1, 1),
                                      "SAME")
        dist = jnp.minimum(dist, jnp.where(reach > 0.5, s, r + 1))
    return jnp.clip(dist - 1, 0, r)


def organized_moments(
    xyz_img: jnp.ndarray,
    valid: jnp.ndarray,
    half_window: int,
    depth_change: float = 0.02,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius-adaptive windowed moments of an organized cloud.

    Args:
      xyz_img: float32[H, W, 3]; invalid pixels may hold NaN/garbage.
      valid: bool[H, W].
      half_window: maximum window half-size r (the window is (2r+1)²).
      depth_change: z jump (meters) treated as a discontinuity.

    Returns:
      moments float32[10, H, W] — per-pixel window sums of
        (count, x, y, z, xx, xy, xz, yy, yz, zz) over that pixel's
        edge-shrunken window;
      r_px int32[H, W] — the per-pixel half-window actually used.
    """
    x = jnp.where(valid, xyz_img[..., 0], 0.0).astype(jnp.float32)
    y = jnp.where(valid, xyz_img[..., 1], 0.0).astype(jnp.float32)
    z = jnp.where(valid, xyz_img[..., 2], 0.0).astype(jnp.float32)
    m = valid.astype(jnp.float32)
    chans = jnp.stack(
        [m, x, y, z, x * x, x * y, x * z, y * y, y * z, z * z], 0)
    r_px = _safe_radius(z, valid, half_window, depth_change)
    out = chans  # r == 0: the pixel alone (flagged invalid downstream)
    for r in range(1, half_window + 1):
        out = jnp.where((r_px == r)[None], _box_sums(chans, r), out)
    return out, r_px


def _cov_from_moments(S: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[10, ...] moment vectors → (cov [..., 3, 3], mean [..., 3], count [...])."""
    n = jnp.maximum(S[0], 1.0)
    mx, my, mz = S[1] / n, S[2] / n, S[3] / n
    cxx = S[4] / n - mx * mx
    cxy = S[5] / n - mx * my
    cxz = S[6] / n - mx * mz
    cyy = S[7] / n - my * my
    cyz = S[8] / n - my * mz
    czz = S[9] / n - mz * mz
    cov = jnp.stack([
        jnp.stack([cxx, cxy, cxz], -1),
        jnp.stack([cxy, cyy, cyz], -1),
        jnp.stack([cxz, cyz, czz], -1),
    ], axis=-2)
    mean = jnp.stack([mx, my, mz], -1)
    return cov, mean, S[0]


@functools.partial(jax.jit, static_argnames=("half_window",))
def estimate_normals_organized(
    xyz_img: jnp.ndarray,
    valid: jnp.ndarray,
    half_window: int = 5,
    viewpoint: Optional[jnp.ndarray] = None,
    depth_change: float = 0.02,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normals + curvature for an organized [H, W, 3] cloud.

    Args:
      xyz_img: float32[H, W, 3]; invalid pixels may hold NaN/garbage.
      valid:   bool[H, W].
      half_window: r; the covariance window is (2r+1)², shrunk per pixel to
        stay clear of depth edges (see module docstring).
      viewpoint: float32[3] sensor origin for orientation (default 0 — the
        camera frame's origin, as PCL flips toward the sensor).
      depth_change: z jump (meters) treated as a discontinuity (PCL's
        setMaxDepthChangeFactor).

    Returns (normals float32[H, W, 3] — zero where undefined,
             curvature float32[H, W] — λ0/Σλ, 0 where undefined).
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    H, W, _ = xyz_img.shape
    S, r_px = organized_moments(xyz_img, valid, half_window, depth_change)
    cov, _, cnt = _cov_from_moments(S.reshape(10, H * W))
    vals, vecs = eigh3x3(cov)
    normal = vecs[:, :, 2].reshape(H, W, 3)       # smallest-eigenvalue axis
    lam = jnp.maximum(vals, 0.0)
    tot = jnp.sum(lam, axis=1)
    curvature = jnp.where(tot > 1e-20, lam[:, 2] / jnp.maximum(tot, 1e-20), 0.0)
    curvature = curvature.reshape(H, W)

    # orient toward the viewpoint (PCL flipNormalTowardsViewpoint)
    to_vp = viewpoint[None, None, :] - xyz_img
    flip = jnp.sum(normal * to_vp, axis=-1, keepdims=True) < 0
    normal = jnp.where(flip, -normal, normal)

    # pixels whose window collapsed onto a depth edge have no estimate (PCL
    # leaves NaN there); require a real plane fit: >=1px window, >=5 points
    ok = valid & (cnt.reshape(H, W) >= 5.0) & (r_px >= 1)
    normal = jnp.where(ok[..., None], normal, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return normal, curvature
