"""Raw organized-cloud ingestion: sensor grid → bounded working set.

The reference consumes full 640×480 organized sensor clouds
(``ROS_server.cpp:2138``, ``crop_pcd.cpp:76-77``) and immediately pays
unordered k-NN normal estimation plus CPU-side filtering on all 307k points.
This module is the TPU-native front end for that raw scale, jitted as one
program:

  organized [H, W, 3] cloud
    → integral-image normals + curvature   (stencils, no NN — A9 fast path)
    → passthrough box crop                 (mask predicate — A8)
    → uniform downsample to ≤ capacity     (sort + segment argmin — A6)
    → padded working-set Cloud + per-point normals/curvature

Everything downstream (keypoints, descriptors, matching, ICP) then runs at
the bounded ``capacity`` exactly as before, with normal estimation already
paid at O(H·W) stencil cost instead of O(N·k) neighbor search. This is both
the raw-sensor parity path (the reference's ``cloud_cb`` shape) and the
latency win: the k-NN normals stage was the single largest block of the
round-1 scene budget.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import SENTINEL, Cloud
from tpu_joints.features.organized import estimate_normals_organized
from tpu_joints.filters.filters import compact_indices, uniform_sample_mask


@functools.partial(
    jax.jit, static_argnames=("block", "half_window", "capacity")
)
def ingest_organized_blocks(
    xyz_img: jnp.ndarray,
    valid: jnp.ndarray,
    block: int = 4,
    half_window: int = 5,
    capacity: Optional[int] = None,
    crop_lo: Optional[jnp.ndarray] = None,
    crop_hi: Optional[jnp.ndarray] = None,
    viewpoint: Optional[jnp.ndarray] = None,
) -> Tuple[Cloud, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-free organized ingestion: one point per ``block``×``block`` pixel
    tile.

    The sensor grid is already a spatial index — a pixel tile at depth z
    covers ≈ (block · 2·z·tan(fov/2)/W)² of surface, so per-tile selection
    IS a uniform downsample for bounded-depth scenes, without the two
    307k-lane sorts the generic voxel path pays (measured: the sorts were
    ~80% of ingest latency at 640×480). Selection is a dense reshape +
    small-axis argmin (the valid pixel nearest the tile's mean position,
    the UniformSampling criterion), so the whole front end at raw
    resolution is ONE reshape + tiny reductions. Normals are then computed
    only at the selected points: each keeps its (2·half_window+1)² pixel
    window (a working-set-sized gather, ~0.5M elements — not a 307k-lane
    image pass), neighbors are depth-gated against the center pixel
    (slope-proportional: |Δz| < 0.02·chebyshev_px, PCL's
    setMaxDepthChangeFactor semantics), and the covariance eigensolve runs
    at working-set size. Without ``capacity`` the working set keeps all
    (H/block)·(W/block) tile lanes; with it, occupied tiles are compacted
    into a ``capacity``-lane cloud (one small tile-count sort) so
    downstream NN stages don't pay for empty-tile padding.

    Returns (scene Cloud, normals, curvature, n_selected).
    """
    from tpu_joints.features.eigen3 import eigh3x3

    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    H, W, _ = xyz_img.shape
    assert H % block == 0 and W % block == 0, (H, W, block)
    Hb, Wb = H // block, W // block

    mask = valid
    p = jnp.where(mask[..., None], xyz_img, SENTINEL).astype(jnp.float32)
    if crop_lo is not None and crop_hi is not None:
        inside = jnp.all((p >= crop_lo) & (p <= crop_hi), axis=-1)
        mask = mask & inside
        p = jnp.where(mask[..., None], p, SENTINEL)

    # --- per-tile selection (dense reshape + small-axis reductions) ------
    txyz = (p.reshape(Hb, block, Wb, block, 3)
             .transpose(0, 2, 1, 3, 4)
             .reshape(Hb * Wb, block * block, 3))
    tm = (mask.reshape(Hb, block, Wb, block)
              .transpose(0, 2, 1, 3)
              .reshape(Hb * Wb, block * block))
    cnt = jnp.sum(tm.astype(jnp.float32), axis=1)
    mean = jnp.sum(jnp.where(tm[..., None], txyz, 0.0), axis=1) / \
        jnp.maximum(cnt, 1.0)[:, None]
    d2 = jnp.sum((txyz - mean[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(tm, d2, jnp.float32(3e38))
    best = jnp.argmin(d2, axis=1)
    xyz = jnp.take_along_axis(txyz, best[:, None, None], 1)[:, 0, :]
    got = cnt > 0
    xyz = jnp.where(got[:, None], xyz, SENTINEL)
    # flat pixel index of each winner (tile/lane arithmetic, no search)
    tile = jnp.arange(Hb * Wb, dtype=jnp.int32)
    bi, bj = tile // Wb, tile % Wb
    di, dj = best.astype(jnp.int32) // block, best.astype(jnp.int32) % block
    pix = (bi * block + di) * W + (bj * block + dj)

    n_selected = jnp.sum(got.astype(jnp.int32))
    if capacity is not None and capacity < Hb * Wb:
        idx, keep = compact_indices(got, capacity)
        xyz = jnp.where(keep[:, None], xyz[idx], SENTINEL)
        pix = pix[idx]
        got = keep

    # --- normals at selected points only ---------------------------------
    r = half_window
    offs_i = jnp.arange(-r, r + 1, dtype=jnp.int32)
    cheb = jnp.maximum(jnp.abs(offs_i[:, None]), jnp.abs(offs_i[None, :]))
    cheb = cheb.reshape(-1).astype(jnp.float32)           # [(2r+1)²]
    rows = jnp.clip(pix // W, 0, H - 1)
    cols = pix % W
    wr = jnp.clip(rows[:, None] + offs_i[None, :], 0, H - 1)   # [M, 2r+1]
    wc = jnp.clip(cols[:, None] + offs_i[None, :], 0, W - 1)
    nidx = (wr[:, :, None] * W + wc[:, None, :]).reshape(xyz.shape[0], -1)
    flat_p = p.reshape(H * W, 3)
    flat_m = mask.reshape(H * W)
    nxyz = flat_p[nidx]                                    # [M, K, 3]
    nval = flat_m[nidx]
    zc = xyz[:, 2]
    # slope-proportional depth gate (PCL max depth change, per pixel step)
    nval = nval & (jnp.abs(nxyz[..., 2] - zc[:, None])
                   <= 0.02 * jnp.maximum(cheb, 1.0)[None, :])
    wgt = nval.astype(jnp.float32)
    wn = jnp.maximum(jnp.sum(wgt, axis=1), 1.0)
    wmean = jnp.sum(nxyz * wgt[..., None], axis=1) / wn[:, None]
    cen = (nxyz - wmean[:, None, :]) * wgt[..., None]
    cov = jnp.einsum("mki,mkj->mij", cen, cen)
    vals, vecs = eigh3x3(cov)
    normals = vecs[..., :, 2]
    to_vp = viewpoint[None, :] - xyz
    normals = jnp.where(
        jnp.sum(normals * to_vp, -1, keepdims=True) < 0, -normals, normals)
    lam = jnp.maximum(vals, 0.0)
    tot = jnp.sum(lam, axis=1)
    curvature = jnp.where(tot > 1e-20, lam[:, 2] / jnp.maximum(tot, 1e-20), 0.0)
    ok_n = got & (jnp.sum(wgt, axis=1) >= 5)
    normals = jnp.where(ok_n[:, None], normals, 0.0)
    curvature = jnp.where(ok_n, curvature, 0.0)
    got = ok_n

    scene = Cloud(xyz=jnp.where(got[:, None], xyz, SENTINEL), mask=got,
                  rgb=jnp.zeros_like(xyz))
    return scene, normals, curvature, n_selected


def _normals_with_fill(xyz_img, valid, half_window, viewpoint):
    """Organized normals + 3-round border fill (shared by both ingest paths).

    Depth-edge pixels get no window (PCL leaves NaN there); they receive the
    averaged normal of nearby estimated pixels instead — silhouette points
    carry real pose information for ICP and SHOT support. Returns
    (normals_img, curv_img, covered bool[H, W])."""
    normals_img, curv_img = estimate_normals_organized(
        xyz_img, valid, half_window=half_window, viewpoint=viewpoint
    )
    has_n = jnp.sum(normals_img * normals_img, axis=-1) > 0.25
    n_fill, c_fill, covered = normals_img, curv_img, has_n
    for _ in range(3):
        cf = covered.astype(jnp.float32)
        ns = jax.lax.reduce_window(n_fill * cf[..., None], 0.0, jax.lax.add,
                                   (3, 3, 1), (1, 1, 1), "SAME")
        cs = jax.lax.reduce_window(cf, 0.0, jax.lax.add, (3, 3), (1, 1),
                                   "SAME")
        curv_s = jax.lax.reduce_window(c_fill * cf, 0.0, jax.lax.add,
                                       (3, 3), (1, 1), "SAME")
        newly = ~covered & (cs > 0.5)
        avg = ns / jnp.maximum(cs, 1.0)[..., None]
        avg = avg / jnp.maximum(
            jnp.linalg.norm(avg, axis=-1, keepdims=True), 1e-9)
        n_fill = jnp.where(newly[..., None], avg, n_fill)
        c_fill = jnp.where(newly, curv_s / jnp.maximum(cs, 1.0), c_fill)
        covered = covered | newly
    return n_fill, c_fill, covered


@functools.partial(
    jax.jit, static_argnames=("capacity", "leaf", "half_window")
)
def ingest_organized(
    xyz_img: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int = 32768,
    leaf: float = 0.004,
    half_window: int = 5,
    crop_lo: Optional[jnp.ndarray] = None,
    crop_hi: Optional[jnp.ndarray] = None,
    viewpoint: Optional[jnp.ndarray] = None,
) -> Tuple[Cloud, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Organized sensor cloud → padded working set with normals.

    Args:
      xyz_img: float32[H, W, 3] camera-frame cloud (NaN/garbage where invalid).
      valid:   bool[H, W].
      capacity: working-set size (static). Points surviving the crop and the
        ``leaf`` uniform downsample fill the set; choose ``leaf`` so the
        survivor count stays under capacity (the traced survivor count is
        returned — callers can assert/log; overflow drops the raster tail).
      leaf: uniform-sampling voxel size in meters (PCL UniformSampling
        semantics: one point per voxel, nearest to the voxel centroid).
      half_window: integral-image normal window half-size in pixels.
      crop_lo/crop_hi: optional float32[3] axis-aligned crop box (the
        reference's PassThrough chain, ``crop_pcd.cpp:109-127``).

    Returns:
      (scene Cloud[capacity], normals float32[capacity, 3],
       curvature float32[capacity], n_selected int32 — survivors BEFORE
       capacity truncation).
    """
    H, W, _ = xyz_img.shape
    n_fill, c_fill, covered = _normals_with_fill(
        xyz_img, valid, half_window, viewpoint)

    flat_xyz = xyz_img.reshape(H * W, 3)
    flat_n = n_fill.reshape(H * W, 3)
    flat_c = c_fill.reshape(H * W)
    # points that still have no normal (deep inside an unestimable band)
    # leave the working set entirely
    mask = valid.reshape(H * W) & covered.reshape(H * W)
    flat_xyz = jnp.where(mask[:, None], flat_xyz, SENTINEL).astype(jnp.float32)

    if crop_lo is not None and crop_hi is not None:
        inside = jnp.all(
            (flat_xyz >= crop_lo[None, :]) & (flat_xyz <= crop_hi[None, :]),
            axis=1,
        )
        mask = mask & inside
        flat_xyz = jnp.where(mask[:, None], flat_xyz, SENTINEL)

    full = Cloud(xyz=flat_xyz, mask=mask, rgb=jnp.zeros_like(flat_xyz))
    keep = uniform_sample_mask(full, leaf) & mask
    n_selected = jnp.sum(keep.astype(jnp.int32))

    idx, got = compact_indices(keep, capacity)
    xyz = jnp.where(got[:, None], flat_xyz[idx], SENTINEL)
    normals = jnp.where(got[:, None], flat_n[idx], 0.0)
    curvature = jnp.where(got, flat_c[idx], 0.0)
    scene = Cloud(xyz=xyz, mask=got, rgb=jnp.zeros_like(xyz))
    return scene, normals, curvature, n_selected
