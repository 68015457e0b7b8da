"""Two-layer coarse-to-fine ("cluster tree") view search (SURVEY.md A29).

The reference's ``FPFH_scenes_clustered.cpp`` first matches 3
cluster-representative poses (h ∈ {18, 8, 0}, ``:298-319``), picks the best
cluster by ICP score (``:504-509``), then searches every pose of the chosen
cluster with the full chain and ``T_org`` composition (``:594-628``,
``:832-854``). TPU formulation: both layers run the standard batched
pipeline (:func:`detect_with_features`) on *gathered view subsets* — the
cluster choice is an ``argmin`` + gather, not a host-side branch, so the
whole tree jits into one program. Scene features are extracted once and
shared by both layers (the reference recomputes nothing scene-side either).

Cluster construction is host-side spherical k-means on the bank's camera
viewing directions — the 42 icosphere views collapse naturally into a few
direction cones, which is what the reference's hand-picked representative
poses approximate.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import Cloud
from tpu_joints.modelbank.bank import ModelBank, gather_views
from tpu_joints.pipelines.detect import (
    DetectionResult,
    detect_with_features,
    prepare_scene,
)


class ViewClusters(NamedTuple):
    """Static cluster tables (host-built, device-resident).

    representatives: int32[K] — one view per cluster (closest to centroid).
    members: int32[K, M] — member view indices, padded by repeating the
      representative (harmless: duplicated views just duplicate candidates).
    """

    representatives: jnp.ndarray
    members: jnp.ndarray


def make_view_clusters(
    bank: ModelBank, n_clusters: int = 3, seed: int = 0, iters: int = 32
) -> ViewClusters:
    """Spherical k-means over camera viewing directions (host-side)."""
    poses = np.asarray(bank.poses)  # [V, 4, 4] model→camera
    # camera viewing direction in the model frame = R^T @ [0,0,1]
    dirs = poses[:, 2, :3]  # third row of R
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    V = dirs.shape[0]
    n_clusters = min(n_clusters, V)

    rng = np.random.default_rng(seed)
    centers = dirs[rng.choice(V, n_clusters, replace=False)]
    for _ in range(iters):
        sim = dirs @ centers.T                      # [V, K]
        assign = sim.argmax(1)
        for k in range(n_clusters):
            sel = dirs[assign == k]
            if len(sel):
                c = sel.mean(0)
                centers[k] = c / max(np.linalg.norm(c), 1e-9)

    sim = dirs @ centers.T
    assign = sim.argmax(1)
    reps, members = [], []
    m_max = max(int((assign == k).sum()) for k in range(n_clusters))
    m_max = max(m_max, 1)
    for k in range(n_clusters):
        idx = np.flatnonzero(assign == k)
        if len(idx) == 0:
            idx = np.array([int(np.argmax(sim[:, k]))])
        rep = idx[int(np.argmax(dirs[idx] @ centers[k]))]
        reps.append(rep)
        pad = np.full(m_max, rep, np.int32)
        pad[: len(idx)] = idx
        members.append(pad)
    return ViewClusters(
        representatives=jnp.asarray(np.asarray(reps, np.int32)),
        members=jnp.asarray(np.stack(members)),
    )


def detect_tree(
    scene: Cloud,
    bank: ModelBank,
    clusters: ViewClusters,
    cfg: DetectionConfig = DetectionConfig(),
    viewpoint: Optional[jnp.ndarray] = None,
    n_refine: int = 2,
) -> DetectionResult:
    """Layer 1 on representatives → pick top clusters → layer 2 on members.

    ``n_refine`` clusters survive to layer 2 (the reference keeps exactly
    one, ``FPFH_scenes_clustered.cpp:504-509``; keeping 2 guards against a
    near-symmetric pose winning the coarse round with a good-but-flipped
    fit). Returns the layer-2 result with view indices mapped back to the
    full bank's numbering. For V views in K clusters this matches
    ~K + n_refine·V/K views instead of V.
    """
    return _tree_fused(scene, bank, clusters, cfg, viewpoint, n_refine)


@functools.partial(jax.jit, static_argnames=("cfg", "n_refine"))
def _tree_fused(scene, bank, clusters, cfg, viewpoint, n_refine) -> DetectionResult:
    feats = prepare_scene(scene, cfg, viewpoint)
    K = clusters.representatives.shape[0]
    n_refine = min(n_refine, K)

    layer1 = detect_with_features(feats, gather_views(bank, clusters.representatives), cfg)
    # per-cluster best candidate fitness (reference selects cluster_grp by
    # the lowest layer-1 ICP score)
    fit = jnp.where(layer1.cand_valid, layer1.cand_fitness, jnp.float32(3e38))
    per_cluster = jnp.min(
        jnp.where(layer1.cand_views[None, :] == jnp.arange(K)[:, None],
                  fit[None, :], jnp.float32(3e38)),
        axis=1,
    )
    _, top_clusters = jax.lax.top_k(-per_cluster, n_refine)

    member_idx = clusters.members[top_clusters].reshape(-1)
    layer2 = detect_with_features(feats, gather_views(bank, member_idx), cfg)

    # map sub-bank view numbering back to full-bank indices
    return layer2._replace(
        view_idx=member_idx[layer2.view_idx],
        cand_views=member_idx[layer2.cand_views],
        metrics={**layer2.metrics, "cluster_id": top_clusters[0],
                 "layer1_fitness": per_cluster[top_clusters[0]]},
    )
