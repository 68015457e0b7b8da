"""Filtering / downsampling / keypoint selection — layer L3 (SURVEY.md A6-A8).

TPU-native replacements for PCL's ``PassThrough`` (reference
``crop_pcd.cpp:109-127``, ``segmentation.cpp:68-71``), ``VoxelGrid``
(``SHOT_demo.cpp:413-417``) and ``UniformSampling`` (``SHOT.cpp:314-323``).

Design: filtering never compacts on device — predicates update the validity
mask (static shapes). Voxel aggregation is sort-by-voxel-id + segment
reductions, the canonical XLA formulation of ragged group-by. When a stage
genuinely needs a smaller array (scene keypoints feeding descriptor
estimation), ``compact_indices`` produces a stable padded gather of the
selected lanes with a static capacity.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import SENTINEL, Cloud

# 10 bits per axis → voxel ids fit in int32 (SURVEY.md: scenes are a few
# meters across with leaf sizes ≥ 1 mm, well within 1024 cells per axis).
_GRID_BITS = 10
_GRID_MAX = (1 << _GRID_BITS) - 1
_INVALID_ID = jnp.int32(1 << 30)

_AXES = {"x": 0, "y": 1, "z": 2}


def passthrough(cloud: Cloud, axis: str, lo: float, hi: float) -> Cloud:
    """Axis-aligned crop; PCL PassThrough equivalent (mask update only)."""
    a = _AXES[axis]
    keep = (cloud.xyz[:, a] >= lo) & (cloud.xyz[:, a] <= hi)
    return cloud.with_mask(keep)


def voxel_ids(xyz: jnp.ndarray, mask: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """int32[N] voxel id per point; invalid points get a sentinel id.

    The grid origin is the masked minimum corner, so ids are translation-
    stable within a call but not across calls (fine: ids are only used for
    same-call grouping).
    """
    big = jnp.asarray(SENTINEL, xyz.dtype)
    lo = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    ijk = jnp.floor((xyz - lo) / jnp.float32(leaf)).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, _GRID_MAX)
    ids = (ijk[:, 0] << (2 * _GRID_BITS)) | (ijk[:, 1] << _GRID_BITS) | ijk[:, 2]
    return jnp.where(mask, ids, _INVALID_ID)


def _sorted_segments(ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort ids; return (order, segment index per sorted lane in [0, N))."""
    order = jnp.argsort(ids)
    sid = ids[order]
    boundary = jnp.concatenate([jnp.array([True]), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    return order, seg


@functools.partial(jax.jit, static_argnames=("leaf",))
def voxel_downsample(cloud: Cloud, leaf: float) -> Cloud:
    """Voxel-grid downsample: one centroid per occupied voxel.

    PCL ``VoxelGrid`` equivalent (reference ``SHOT_demo.cpp:413-417``).
    Output capacity equals input capacity; occupied-voxel centroids fill a
    prefix of the lanes (the rest are masked padding).
    """
    N = cloud.capacity
    ids = voxel_ids(cloud.xyz, cloud.mask, leaf)
    order, seg = _sorted_segments(ids)
    xyz_s = cloud.xyz[order]
    rgb_s = cloud.rgb[order]
    w = cloud.mask[order].astype(jnp.float32)

    sums = jax.ops.segment_sum(xyz_s * w[:, None], seg, num_segments=N)
    rgb_sums = jax.ops.segment_sum(rgb_s * w[:, None], seg, num_segments=N)
    cnts = jax.ops.segment_sum(w, seg, num_segments=N)
    valid = cnts > 0
    denom = jnp.maximum(cnts, 1.0)[:, None]
    xyz_out = jnp.where(valid[:, None], sums / denom, SENTINEL)
    rgb_out = jnp.where(valid[:, None], rgb_sums / denom, 0.0)
    return Cloud(xyz=xyz_out, mask=valid, rgb=rgb_out)


@functools.partial(jax.jit, static_argnames=("radius",))
def uniform_sample_mask(cloud: Cloud, radius: float) -> jnp.ndarray:
    """bool[N]: keep, per voxel of size ``radius``, the valid point nearest
    to the voxel centroid — PCL ``UniformSampling`` semantics
    (reference ``SHOT.cpp:314-323``).
    """
    N = cloud.capacity
    ids = voxel_ids(cloud.xyz, cloud.mask, radius)
    order, seg = _sorted_segments(ids)
    xyz_s = cloud.xyz[order]
    w = cloud.mask[order].astype(jnp.float32)

    sums = jax.ops.segment_sum(xyz_s * w[:, None], seg, num_segments=N)
    cnts = jax.ops.segment_sum(w, seg, num_segments=N)
    centroid = sums / jnp.maximum(cnts, 1.0)[:, None]
    d = jnp.sum((xyz_s - centroid[seg]) ** 2, axis=-1)
    d = jnp.where(cloud.mask[order], d, jnp.float32(3e38))
    dmin = jax.ops.segment_min(d, seg, num_segments=N)
    # Tie-break by smallest sorted lane index so exactly one point survives.
    lane = jnp.arange(N, dtype=jnp.int32)
    cand = jnp.where(d <= dmin[seg], lane, jnp.int32(N))
    winner_lane = jax.ops.segment_min(cand, seg, num_segments=N)
    is_winner = (lane == winner_lane[seg]) & cloud.mask[order]
    keep = jnp.zeros((N,), bool).at[order].set(is_winner)
    return keep


def compact_indices(mask: jnp.ndarray, capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable padded compaction: indices of up to ``capacity`` selected
    lanes plus a validity mask. Static output shape; order-preserving.

    When more than ``capacity`` lanes are selected, the selection is
    thinned UNIFORMLY — exactly ``capacity`` evenly spaced keeps — rather
    than prefix-truncated: lanes arrive in spatial order (concatenation /
    sensor-raster), so "first capacity" would silently drop a contiguous
    region of the scene — measured as all keypoints landing on one of two
    object instances and the other becoming undetectable.
    """
    sel = mask.astype(jnp.int32)
    n = jnp.sum(sel)
    rank = jnp.cumsum(sel) - 1  # rank of each selected lane, in lane order
    # Bresenham decimation: keep selected rank r iff floor(r·c/n) advances
    # over floor((r−1)·c/n) — exactly min(n, capacity) evenly spaced keeps
    # (a plain stride ceil(n/c) over-thins marginal overflows, e.g.
    # 282 selected at capacity 256 would drop to 141).
    s = jnp.float32(capacity) / jnp.maximum(n, 1).astype(jnp.float32)
    r = rank.astype(jnp.float32)
    mask = mask & (jnp.floor(r * s) > jnp.floor((r - 1.0) * s))
    # Scatter-based stable compaction: after the decimation above, kept
    # lanes have unique post-thinning ranks in [0, capacity), so writing
    # each kept lane index at its rank is an exact order-preserving
    # partition — no argsort (a [N] sort is ~1 ms on TPU vs µs for
    # cumsum+scatter; this runs in every frame's keypoint selection).
    # Dropped lanes all target the dump slot `capacity`, which is sliced
    # off (duplicate writes there are fine — the slot is discarded).
    N = mask.shape[0]
    lane = jnp.arange(N, dtype=jnp.int32)
    rank2 = jnp.cumsum(mask.astype(jnp.int32)) - 1
    target = jnp.where(mask, rank2, jnp.int32(capacity))
    idx = jnp.zeros((capacity + 1,), jnp.int32).at[target].set(lane)[:capacity]
    n_kept = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), capacity)
    # unfilled tail slots stay index-0 with valid=False — the same
    # "invalid index-0 lanes" padding contract as before (static
    # [capacity] shape regardless of N vs capacity)
    valid = jnp.arange(capacity, dtype=jnp.int32) < n_kept
    return idx, valid


def compact_cloud(cloud: Cloud, select: jnp.ndarray, capacity: int) -> Tuple[Cloud, jnp.ndarray]:
    """Gather selected points into a smaller padded Cloud.

    Returns (compact cloud, int32[capacity] original indices) — the indices
    let descriptor stages refer back to full-cloud attributes (e.g. normals).
    """
    idx, valid = compact_indices(select & cloud.mask, capacity)
    xyz = jnp.where(valid[:, None], cloud.xyz[idx], SENTINEL)
    rgb = jnp.where(valid[:, None], cloud.rgb[idx], 0.0)
    return Cloud(xyz=xyz, mask=valid, rgb=rgb), idx
