"""Region-growing segmentation + per-cluster curvature filtering
(SURVEY.md A10, A11).

Replaces PCL's ``RegionGrowing`` (reference ``SHOT_demo.cpp:302-314`` with
smoothness 7°, curvature 7.0, k=100 normals) and the hand-rolled
per-cluster mean-curvature rejection (``SHOT_demo.cpp:319-383``, keep
clusters with mean curvature ≤ 0.04).

PCL grows regions from low-curvature seeds with a BFS — inherently
sequential. The TPU formulation is iterated *min-label propagation* over a
kNN graph (SURVEY.md §1 L3 mapping): a directed edge i→j exists when i may
act as a seed (curvature(i) < curvature_threshold) and the normals agree
within the smoothness angle — exactly PCL's growth rule. Propagating labels
to a fixed point computes the connected components of that relation in
O(graph diameter) sweeps, bounded by a ``lax.while_loop``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.neighbors import knn


class Clusters(NamedTuple):
    """labels: int32[N] cluster id = smallest member index, -1 for
    invalid/undersized; sizes: int32[N] size of the label-indexed cluster
    (indexed by label id, 0 elsewhere)."""

    labels: jnp.ndarray
    sizes: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("k", "smoothness_deg", "curvature_threshold",
                     "min_cluster_size", "max_sweeps", "max_edge"),
)
def region_growing(
    cloud: Cloud,
    normals: jnp.ndarray,
    curvature: jnp.ndarray,
    k: int = 30,
    smoothness_deg: float = 7.0,
    curvature_threshold: float = 7.0,
    min_cluster_size: int = 50,
    max_sweeps: int = 200,
    max_edge: float = 3.0e38,
) -> Clusters:
    """``max_edge`` caps the length of graph edges (meters). PCL's kNN
    edges are implicitly short at sensor density; on sparse or cluttered
    clouds an uncapped kNN can bridge disjoint structures (a clutter blob
    reaching the table plane), merging clusters that the reference's BFS
    would never join. One lucky bridge dilutes a cluster's mean curvature
    and defeats the A11 filter — cap the edges to the expected point
    spacing scale to keep components honest."""
    N = cloud.capacity
    # allow_pallas=False: region growing runs in the prepare executable of
    # a process that also re-executes the ICP Mosaic kernel; a second
    # distinct Mosaic kNN program in that alternation re-triggers the TPU
    # runtime INVALID_ARGUMENT fault (docs/PERFORMANCE.md) at full-bench
    # shapes even though every reduced reproduction passes
    d, idx = knn(cloud.xyz, cloud.xyz, k, source_mask=cloud.mask,
                 allow_pallas=False)
    # d is squared; the cap also excludes the masked-source +BIG sentinels
    edge_cap_sq = min(float(max_edge) ** 2, 1e30)
    nbr_ok = (d < jnp.float32(edge_cap_sq)) & cloud.mask[:, None]

    cos_thresh = jnp.cos(jnp.radians(jnp.float32(smoothness_deg)))
    nbr_normals = normals[idx]  # [N, K, 3]
    cos = jnp.abs(jnp.einsum("nkj,nj->nk", nbr_normals, normals))
    smooth = cos >= cos_thresh
    # directed edge from neighbor i (seed-capable) into point n
    seed_ok = curvature[idx] < curvature_threshold
    edge_in = nbr_ok & smooth & seed_ok  # [N, K]: idx[n,k] -> n

    init = jnp.where(cloud.mask, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        labels, _, it = state
        nbr_lab = jnp.where(edge_in, labels[idx], jnp.int32(N))
        new = jnp.minimum(labels, jnp.min(nbr_lab, axis=1))
        # pointer-jumping compression (Shiloach–Vishkin shortcut): a label
        # is a point index, so chasing new[new] splices directed paths —
        # if l2 ⇝ l and l ⇝ n then l2 ⇝ n (each hop's seed gate was
        # checked when that hop first propagated). Each extra gather
        # squares the effective path length per sweep, turning the
        # O(graph diameter) sweep count (≈150 along the bench cylinder,
        # ~55 ms on v5e) into O(log diameter) (~10 sweeps).
        for _ in range(2):
            new = jnp.minimum(new, new[jnp.minimum(new, N - 1)])
        new = jnp.where(cloud.mask, new, jnp.int32(N))
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))

    ones = cloud.mask.astype(jnp.int32)
    sizes = jax.ops.segment_sum(ones, jnp.minimum(labels, N - 1), num_segments=N)
    big = sizes[jnp.clip(labels, 0, N - 1)] >= min_cluster_size
    labels = jnp.where(cloud.mask & big, labels, -1)
    return Clusters(labels=labels, sizes=sizes)


@functools.partial(jax.jit, static_argnames=("max_mean_curvature",))
def cluster_curvature_filter(
    clusters: Clusters,
    curvature: jnp.ndarray,
    mask: jnp.ndarray,
    max_mean_curvature: float = 0.04,
) -> jnp.ndarray:
    """bool[N]: points in clusters whose *mean* curvature ≤ threshold —
    the reference's cylinder-surface selector (``SHOT_demo.cpp:319-383``:
    flat/smooth pipe clusters pass, weld seams and clutter fail)."""
    N = curvature.shape[0]
    lab = jnp.clip(clusters.labels, 0, N - 1)
    valid = mask & (clusters.labels >= 0)
    w = valid.astype(jnp.float32)
    sums = jax.ops.segment_sum(curvature * w, lab, num_segments=N)
    cnts = jax.ops.segment_sum(w, lab, num_segments=N)
    mean = sums / jnp.maximum(cnts, 1.0)
    keep_cluster = mean <= max_mean_curvature
    return valid & keep_cluster[lab]
