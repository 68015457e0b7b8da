"""Region growing on a coarse 3-D voxel lattice (SURVEY.md A10 — the
bounded-cost path for UNORGANIZED input).

The generic ``region_growing`` reproduces PCL's BFS over an explicit kNN
graph (reference ``SHOT_demo.cpp:302-314``) — an O(N²) distance problem
that dominates file-driven segmented detection (``SHOT_scenes.cpp:204-254``
loads raw PCDs with no sensor lattice to exploit). The organized fast path
(``segment.organized``) showed the cure: when adjacency is encoded in a
lattice, the growth relation is a handful of shifted-volume compares and
connected components cost O(log diameter) min-label sweeps.

An unorganized cloud has no sensor lattice — so build one: voxelize the
crop volume at a coarse leaf (~2× the keypoint spacing), aggregate each
voxel's mean normal / mean curvature / occupancy with segment-sums (the
same sort-free scatter the voxel downsample uses), run the lattice region
growing over the 26-neighborhood of the [G, G, G] grid, and project labels
back to points through their voxel id. Total cost is O(N) scatter/gather
plus O(G³ · log diameter) VPU stencils — independent of N² and of point
order.

Semantic mapping to PCL's rule (same class as the other two backends):

  * a directed edge u→v exists between OCCUPIED 26-adjacent voxels when u
    may seed (mean curvature(u) < threshold) and the voxel mean normals
    agree within the smoothness angle **scaled to the lattice step**:
    PCL's smoothness bound is an angle per POINT step (its kNN edges span
    one sensor pitch), so on a surface of curvature κ the per-edge normal
    delta it tolerates is κ·pitch — at a voxel step of ``leaf·|d|`` the
    same surface turns by κ·leaf·|d|, and the faithful gate is
    ``smoothness · (leaf·|d| / pitch)`` (clamped at 89°). Consequence: at
    coarse leaves the normal gate separates CREASES (sharp folds), not
    gentle curvature — smooth cylinders stay whole exactly as they do for
    PCL at point scale;
  * ``max_edge`` is inherent: adjacency reaches at most √3·leaf;
  * labels are point-space (smallest member point index — the id contract
    ``cluster_curvature_filter`` expects), -1 for invalid/undersized, and
    sizes are POINT counts, so the A11 per-cluster mean-curvature filter
    applies unchanged.

Resolution caveat: two structures closer than one leaf fuse (PCL's kNN
graph at sensor density has the same failure radius); pick the leaf at or
below the min structure separation. Points outside the G³ crop box are
left unlabeled (-1) — crop first (the pipelines do).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.segment.region_growing import Clusters

# 26-neighborhood offsets
_DIRS3 = tuple(
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
)


def _shift3d(a: jnp.ndarray, d: tuple, fill) -> jnp.ndarray:
    """out[x, y, z] = a[x + dx, y + dy, z + dz] (edges → fill)."""
    out = jnp.roll(a, tuple(-x for x in d), axis=(0, 1, 2))
    for ax, dd in enumerate(d):
        if dd == 1:
            idx = [slice(None)] * 3
            idx[ax] = -1
            out = out.at[tuple(idx)].set(fill)
        elif dd == -1:
            idx = [slice(None)] * 3
            idx[ax] = 0
            out = out.at[tuple(idx)].set(fill)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("leaf", "grid", "smoothness_deg", "curvature_threshold",
                     "min_cluster_size", "max_sweeps", "pitch"),
)
def region_growing_voxel(
    cloud: Cloud,
    normals: jnp.ndarray,
    curvature: jnp.ndarray,
    leaf: float = 0.04,
    grid: int = 64,
    smoothness_deg: float = 7.0,
    curvature_threshold: float = 7.0,
    min_cluster_size: int = 50,
    max_sweeps: int = 32,
    pitch: float = 0.005,
) -> Clusters:
    """Bounded-cost region growing for unorganized clouds (module doc).

    Args:
      cloud: padded Cloud [N]; normals float32[N, 3] (viewpoint-oriented);
        curvature float32[N].
      leaf: voxel edge (meters) — also the adjacency scale (≤ √3·leaf).
      grid: static voxels per axis; the lattice covers ``grid·leaf`` from
        the masked minimum corner.
      pitch: the point spacing ``smoothness_deg`` was calibrated for
        (PCL's per-point-step semantics); the per-direction gate scales by
        ``leaf·|d| / pitch`` — see module doc.

    Returns point-space :class:`Clusters` (labels = smallest member point
    index, -1 invalid/undersized; sizes = point counts indexed by label).
    """
    xyz, mask = cloud.xyz, cloud.mask
    N = xyz.shape[0]
    G3 = grid ** 3

    mn = jnp.min(jnp.where(mask[:, None], xyz, jnp.float32(3e38)), axis=0)
    ci = jnp.floor((xyz - mn[None, :]) / jnp.float32(leaf)).astype(jnp.int32)
    in_grid = mask & jnp.all((ci >= 0) & (ci < grid), axis=1)
    vid = (ci[:, 0] * grid + ci[:, 1]) * grid + ci[:, 2]
    vid = jnp.where(in_grid, vid, G3)          # sentinel bucket for drops

    # per-voxel aggregates (one scatter pass; the +1 slot absorbs drops)
    w = in_grid.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, vid, num_segments=G3 + 1)[:G3]
    nsum = jax.ops.segment_sum(normals * w[:, None], vid,
                               num_segments=G3 + 1)[:G3]
    csum = jax.ops.segment_sum(curvature * w, vid, num_segments=G3 + 1)[:G3]
    occ = (cnt > 0).reshape(grid, grid, grid)
    vnorm = nsum / jnp.maximum(
        jnp.linalg.norm(nsum, axis=-1, keepdims=True), 1e-12)
    vnorm = vnorm.reshape(grid, grid, grid, 3)
    vcurv = (csum / jnp.maximum(cnt, 1.0)).reshape(grid, grid, grid)

    import math

    gates = []
    for d in _DIRS3:
        # per-direction smoothness gate scaled to this step's length
        # (module doc: PCL's bound is an angle per POINT step)
        step = leaf * math.sqrt(sum(x * x for x in d))
        eff = min(math.radians(smoothness_deg) * step / pitch,
                  math.radians(89.0))
        cos_thresh = jnp.float32(math.cos(eff))
        nb_nrm = _shift3d(vnorm, d, jnp.float32(0))
        nb_cur = _shift3d(vcurv, d, jnp.float32(3e38))
        nb_occ = _shift3d(occ, d, False)
        cos = jnp.abs(jnp.sum(nb_nrm * vnorm, axis=-1))
        gates.append(occ & nb_occ
                     & (cos >= cos_thresh)
                     & (nb_cur < curvature_threshold))
    edge_in = jnp.stack(gates)  # [26, G, G, G]: neighbor d → voxel

    flat_idx = jnp.arange(G3, dtype=jnp.int32).reshape(grid, grid, grid)
    init = jnp.where(occ, flat_idx, jnp.int32(G3))

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        labels, _, it = state
        new = labels
        for k, d in enumerate(_DIRS3):
            nb = _shift3d(labels, d, jnp.int32(G3))
            new = jnp.minimum(new, jnp.where(edge_in[k], nb, jnp.int32(G3)))
        # pointer jumping: labels are voxel indices, chasing new[new]
        # splices directed paths (O(log diameter) total sweeps)
        f = new.reshape(G3)
        for _ in range(2):
            f = jnp.minimum(f, f[jnp.minimum(f, G3 - 1)])
        new = jnp.where(occ, f.reshape(grid, grid, grid), jnp.int32(G3))
        return new, jnp.any(new != labels), it + 1

    vlab, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))

    # project voxel roots back to points, then relabel each root to its
    # cluster's smallest member POINT index (the Clusters id contract)
    proot = jnp.where(in_grid, vlab.reshape(G3)[jnp.minimum(vid, G3 - 1)],
                      jnp.int32(G3))
    min_pt = jax.ops.segment_min(jnp.arange(N, dtype=jnp.int32), proot,
                                 num_segments=G3 + 1)
    labels = jnp.where(in_grid, min_pt[jnp.minimum(proot, G3)], -1)

    ones = (labels >= 0).astype(jnp.int32)
    sizes = jax.ops.segment_sum(ones, jnp.clip(labels, 0, N - 1),
                                num_segments=N)
    big = sizes[jnp.clip(labels, 0, N - 1)] >= min_cluster_size
    labels = jnp.where((labels >= 0) & big, labels, -1)
    return Clusters(labels=labels, sizes=sizes)
