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


def _tile_select(xyz_img, valid, block, crop_lo, crop_hi):
    """Crop + one-winner-per-tile selection on [H, W] planes.

    Returns (x, y, z, mask) full-resolution planes and (pix, got) flat
    [Hb·Wb] arrays: the winning pixel per tile and whether the tile holds
    any valid point.
    """
    H, W, _ = xyz_img.shape
    assert H % block == 0 and W % block == 0, (H, W, block)
    Hb, Wb = H // block, W // block

    mask = valid
    x = jnp.where(mask, xyz_img[..., 0], SENTINEL).astype(jnp.float32)
    y = jnp.where(mask, xyz_img[..., 1], SENTINEL).astype(jnp.float32)
    z = jnp.where(mask, xyz_img[..., 2], SENTINEL).astype(jnp.float32)
    if crop_lo is not None and crop_hi is not None:
        inside = ((x >= crop_lo[0]) & (x <= crop_hi[0])
                  & (y >= crop_lo[1]) & (y <= crop_hi[1])
                  & (z >= crop_lo[2]) & (z <= crop_hi[2]))
        mask = mask & inside
        x = jnp.where(mask, x, SENTINEL)
        y = jnp.where(mask, y, SENTINEL)
        z = jnp.where(mask, z, SENTINEL)

    # --- per-tile selection (plane reduce_windows, stride = block) --------
    m = mask.astype(jnp.float32)

    def rw(a, init, op):
        return jax.lax.reduce_window(a, init, op, (block, block),
                                     (block, block), "VALID")

    cnt = rw(m, 0.0, jax.lax.add)                              # [Hb, Wb]
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    mx = rw(jnp.where(mask, x, 0.0), 0.0, jax.lax.add) * inv
    my = rw(jnp.where(mask, y, 0.0), 0.0, jax.lax.add) * inv
    mz = rw(jnp.where(mask, z, 0.0), 0.0, jax.lax.add) * inv
    up = lambda a: jnp.repeat(jnp.repeat(a, block, 0), block, 1)
    d2 = (x - up(mx)) ** 2 + (y - up(my)) ** 2 + (z - up(mz)) ** 2
    d2 = jnp.where(mask, d2, jnp.float32(3e38))
    tmin = rw(d2, jnp.float32(3e38), jax.lax.min)
    # the UniformSampling winner: the valid pixel nearest the tile mean
    # (ties broken toward the larger flat pixel index)
    winner = (d2 <= up(tmin)) & mask
    pixidx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    best_pix = rw(jnp.where(winner, pixidx, -1).astype(jnp.float32),
                  jnp.float32(-1), jax.lax.max).astype(jnp.int32)
    got = (cnt > 0).reshape(Hb * Wb)
    pix = jnp.maximum(best_pix.reshape(Hb * Wb), 0)
    return x, y, z, mask, pix, got, (mx, my, mz)


def _lattice_key_flags(tmeans, got2d: jnp.ndarray, g: int) -> jnp.ndarray:
    """One keypoint flag per ``g``×``g`` cell of the tile lattice.

    The same winner rule as UniformSampling, expressed on the lattice: in
    every occupied cell, flag the tile whose (tile-mean) position is
    nearest the cell's mean position — pure strided ``reduce_window``
    stencils, no sort (the generic 3-D voxel path pays two working-set
    sorts per frame). Ties break toward the larger flat tile index.

    Args: tmeans = (mx, my, mz) [Hb, Wb] tile-mean planes (SENTINEL-free
    only where got2d); got2d bool[Hb, Wb]. Returns bool[Hb, Wb].
    """
    mx, my, mz = tmeans
    Hb, Wb = got2d.shape
    Hp, Wp = -(-Hb // g) * g, -(-Wb // g) * g
    pad = ((0, Hp - Hb), (0, Wp - Wb))
    m2 = jnp.pad(got2d, pad)
    X = jnp.pad(jnp.where(got2d, mx, 0.0), pad)
    Y = jnp.pad(jnp.where(got2d, my, 0.0), pad)
    Z = jnp.pad(jnp.where(got2d, mz, 0.0), pad)

    def rw(a, init, op):
        return jax.lax.reduce_window(a, init, op, (g, g), (g, g), "VALID")

    cnt = rw(m2.astype(jnp.float32), 0.0, jax.lax.add)
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    cx, cy, cz = rw(X, 0.0, jax.lax.add) * inv, rw(Y, 0.0, jax.lax.add) * inv, \
        rw(Z, 0.0, jax.lax.add) * inv
    up = lambda a: jnp.repeat(jnp.repeat(a, g, 0), g, 1)
    d2 = (X - up(cx)) ** 2 + (Y - up(cy)) ** 2 + (Z - up(cz)) ** 2
    d2 = jnp.where(m2, d2, jnp.float32(3e38))
    cmin = rw(d2, jnp.float32(3e38), jax.lax.min)
    winner = (d2 <= up(cmin)) & m2
    # exactly one winner per occupied cell: keep the largest flat index
    tidx = jnp.arange(Hp * Wp, dtype=jnp.int32).reshape(Hp, Wp)
    best = rw(jnp.where(winner, tidx, -1).astype(jnp.float32),
              jnp.float32(-1), jax.lax.max).astype(jnp.int32)
    flag = winner & (tidx == up(best))
    return flag[:Hb, :Wb]


def _moment_normals(x, y, z, mask, pix, got, half_window, viewpoint):
    """Positions + normals + curvature at the ``pix`` pixels, from the
    shared box-filtered moment maps (``features.organized``). The only
    gathers are O(len(pix)): 10 moment scalars per point.

    Normals match the k-NN estimator's definition (covariance smallest
    eigenvector, viewpoint-oriented, curvature λ0/Σλ) with PCL's
    integral-image edge semantics: windows shrink to stay clear of
    valid-valid depth jumps, invalid pixels are excluded by the count
    channel (see ``organized_moments``).

    Returns (xyz [M, 3], normals, curvature, ok) with ok = got minus the
    pixels where no window survives the depth-edge shrink.
    """
    from tpu_joints.features.eigen3 import eigh3x3
    from tpu_joints.features.organized import _cov_from_moments, organized_moments

    H, W = mask.shape
    S_img, r_px = organized_moments(
        jnp.stack([x, y, z], -1), mask, half_window)
    rows = jnp.clip(pix // W, 0, H - 1)
    cols = pix % W
    S = S_img[:, rows, cols]                                   # [10, M]
    cov, _, n_support = _cov_from_moments(S)
    xyz = jnp.stack([x[rows, cols], y[rows, cols], z[rows, cols]], -1)
    vals, vecs = eigh3x3(cov)
    normals = vecs[..., :, 2]
    to_vp = viewpoint[None, :] - xyz
    normals = jnp.where(
        jnp.sum(normals * to_vp, -1, keepdims=True) < 0, -normals, normals)
    lam = jnp.maximum(vals, 0.0)
    tot = jnp.sum(lam, axis=1)
    curvature = jnp.where(tot > 1e-20, lam[:, 2] / jnp.maximum(tot, 1e-20), 0.0)
    ok = got & (n_support >= 5.0) & (r_px[rows, cols] >= 1)
    normals = jnp.where(ok[:, None], normals, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return xyz, normals, curvature, ok


@functools.partial(
    jax.jit, static_argnames=("block", "half_window", "capacity", "key_group")
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
    key_group: int = 0,
) -> Tuple[Cloud, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-free organized ingestion: one point per ``block``×``block`` pixel
    tile, everything at full resolution expressed as plane-wise stencils.

    The sensor grid is already a spatial index — a pixel tile at depth z
    covers ≈ (block · 2·z·tan(fov/2)/W)² of surface, so per-tile selection
    IS a uniform downsample for bounded-depth scenes, without the two
    307k-lane sorts the generic voxel path pays. TPU-critical layout: all
    full-resolution work runs on [H, W] *planes* (lane axis = W) — per-tile
    stats via strided ``reduce_window``, the winning pixel via a min-equality
    match, and normals via the shared box-filtered moment maps
    (``features.organized.organized_moments``). The only gathers are
    O(capacity): 10 moment scalars per selected point. The earlier
    formulation (reshape/transpose to [tiles, block², 3] + per-point window
    gathers) paid ~42× lane padding on the trailing dim and random-gather
    serialization — 36 ms at 640×480 vs ~5 ms for this one (v5e).

    Returns (scene Cloud, normals, curvature, n_selected); with
    ``key_group > 0``, a fifth element — bool[capacity] lattice keypoint
    flags aligned with the scene lanes (cfg.keypoints == "lattice").
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    H, W, _ = xyz_img.shape
    Hb, Wb = H // block, W // block
    x, y, z, mask, pix, got, tmeans = _tile_select(
        xyz_img, valid, block, crop_lo, crop_hi)

    key_flag = None
    if key_group > 0:
        key_flag = _lattice_key_flags(
            tmeans, got.reshape(Hb, Wb), key_group).reshape(Hb * Wb)

    n_selected = jnp.sum(got.astype(jnp.int32))
    if capacity is not None and capacity < Hb * Wb:
        # compact_indices thins overflow UNIFORMLY (Bresenham decimation
        # along the raster order - no spatial bias, no over-thinning)
        idx, keep = compact_indices(got, capacity)
        pix = pix[idx]
        got = keep
        if key_flag is not None:
            key_flag = key_flag[idx] & keep

    xyz, normals, curvature, got = _moment_normals(
        x, y, z, mask, pix, got, half_window, viewpoint)
    scene = Cloud(xyz=jnp.where(got[:, None], xyz, SENTINEL), mask=got,
                  rgb=jnp.zeros_like(xyz))
    if key_flag is not None:
        return scene, normals, curvature, n_selected, key_flag & got
    return scene, normals, curvature, n_selected


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "half_window", "key_group")
)
def ingest_organized_segmented(
    xyz_img: jnp.ndarray,
    valid: jnp.ndarray,
    cfg,
    block: int = 4,
    half_window: int = 5,
    crop_lo: Optional[jnp.ndarray] = None,
    crop_hi: Optional[jnp.ndarray] = None,
    viewpoint: Optional[jnp.ndarray] = None,
    key_group: int = 0,
) -> Tuple[Cloud, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Organized ingestion WITH the reference's scene-crop chain fused in:
    crop → dominant-plane removal → region growing → cluster curvature
    filter (``SHOT_demo.cpp:282-400``, ``segmentation.cpp:94-110``), all
    executed on the sensor tile lattice BEFORE compaction.

    The generic path (``prepare_scene`` with ``cfg.segment_scene``) pays an
    O(N²) kNN graph build for region growing at working-set scale; here the
    lattice IS the graph (``segment.organized.region_growing_lattice``) and
    segmentation costs a few [Hb, Wb]-plane stencils. Because the table and
    clutter are dropped *before* the working set is cut, the surviving
    capacity only needs to hold the object points — the segmented pipeline
    then runs at the same capacities (and reuses the same compiled detect
    executables) as the unsegmented one.

    ``cfg`` is a :class:`DetectionConfig` (hashable → static): uses
    remove_plane / plane_dist / plane_min_fraction, rg_* gates,
    cluster_max_curvature, and scene_capacity. Pass the SAME cfg to
    ``detect`` but with ``segment_scene=False`` / ``remove_plane=False``
    there (this front end already did both).

    Returns (scene Cloud[scene_capacity], normals, curvature, n_selected —
    survivors AFTER segmentation, before capacity truncation); with
    ``key_group > 0``, a fifth element — bool[capacity] lattice keypoint
    flags over the SEGMENTATION SURVIVORS (a cropped-away tile never
    seeds a key cell).
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    H, W, _ = xyz_img.shape
    Hb, Wb = H // block, W // block
    T = Hb * Wb
    x, y, z, mask, pix, got, tmeans = _tile_select(
        xyz_img, valid, block, crop_lo, crop_hi)

    # normals at ALL tile winners (the lattice nodes): the moment gather is
    # O(T) scalars and eigh3x3 is closed-form — cheap at 19200 nodes
    txyz, tnorm, tcurv, got = _moment_normals(
        x, y, z, mask, pix, got, half_window, viewpoint)

    if cfg.remove_plane:
        from tpu_joints.segment.sac import sac_plane

        nodes = Cloud(xyz=jnp.where(got[:, None], txyz, SENTINEL),
                      mask=got, rgb=jnp.zeros_like(txyz))
        # deterministic hypothesis draw: same scene → same crop
        plane = sac_plane(nodes, tnorm, jax.random.PRNGKey(0),
                          n_hypotheses=256,
                          distance_threshold=cfg.plane_dist)
        n_valid = jnp.sum(got.astype(jnp.int32))
        dominant = plane.score >= (
            cfg.plane_min_fraction * n_valid.astype(jnp.float32))
        got = got & ~(plane.inliers & dominant)

    if cfg.segment_scene:
        from tpu_joints.segment import cluster_curvature_filter
        from tpu_joints.segment.organized import region_growing_lattice

        clusters = region_growing_lattice(
            txyz.reshape(Hb, Wb, 3), tnorm.reshape(Hb, Wb, 3),
            tcurv.reshape(Hb, Wb), got.reshape(Hb, Wb),
            smoothness_deg=cfg.rg_smoothness_deg,
            curvature_threshold=cfg.rg_curvature,
            min_cluster_size=cfg.rg_min_cluster,
            max_edge=cfg.rg_max_edge,
        )
        keep = cluster_curvature_filter(
            clusters, tcurv, got, cfg.cluster_max_curvature)
    else:
        keep = got

    n_selected = jnp.sum(keep.astype(jnp.int32))
    capacity = cfg.scene_capacity
    # compact_indices thins overflow uniformly along the raster order
    idx, ok = compact_indices(keep, capacity)
    xyz = jnp.where(ok[:, None], txyz[idx], SENTINEL)
    normals = jnp.where(ok[:, None], tnorm[idx], 0.0)
    curvature = jnp.where(ok, tcurv[idx], 0.0)
    scene = Cloud(xyz=xyz, mask=ok, rgb=jnp.zeros_like(xyz))
    if key_group > 0:
        # key cells see only the segmentation survivors: tmeans is the
        # raw tile mean (position of the cell winner), keep is the gate
        key_flag = _lattice_key_flags(
            tmeans, keep.reshape(Hb, Wb), key_group).reshape(T)
        return scene, normals, curvature, n_selected, key_flag[idx] & ok
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

    # compact_indices thins overflow uniformly along the raster order
    idx, got = compact_indices(keep, capacity)
    xyz = jnp.where(got[:, None], flat_xyz[idx], SENTINEL)
    normals = jnp.where(got[:, None], flat_n[idx], 0.0)
    curvature = jnp.where(got, flat_c[idx], 0.0)
    scene = Cloud(xyz=xyz, mask=got, rgb=jnp.zeros_like(xyz))
    return scene, normals, curvature, n_selected
