"""FPFH-33 descriptor (SURVEY.md A16).

TPU-native re-design of PCL's ``FPFHEstimation`` (reference
``FPFH_demo.cpp:422-428``, ``:505-510``): Fast Point Feature Histograms
(Rusu et al.). Two passes:

1. SPFH — for every point, Darboux-frame angular features (θ, α, φ)
   against each radius neighbor, hard-binned into three 11-bin histograms.
   PCL's increment is ``100 / (#radius neighbors − 1)`` — the denominator
   counts every non-self neighbor, including pairs the degeneracy guard
   later skips (``computePointSPFHSignature``).
2. FPFH — PCL's ``weightPointSPFHSignature`` is the 1/d²-weighted sum of
   the *neighbors'* SPFHs only: the query's own SPFH never enters (the
   loop skips ``dists == 0`` — "minus the query point itself" — and adds
   no self term, a deliberate deviation from the paper's
   ``SPFH(p) + (1/k)Σ`` formula). Each 11-bin block is then renormalized
   to sum 100, which also absorbs the paper's 1/k factor.

Binning is a one-hot matmul (``Σ_k onehot(bin_k) · w_k``), not a scatter,
and the neighbor-SPFH mixing is a weighted gather-sum — both batched over
all points at once. Sub-histogram order is PCL's ``FPFHSignature33``
layout [f1=θ | f2=α | f3=φ]: ``pcl::computePairFeatures`` returns the
atan2-range feature as f1 (binned with the ``(f + π)/2π`` rule), and the
two cosine-range features as f2/f3 — numeric parity requires the same
block order, not merely bank/scene consistency.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.neighbors import radius_neighbors

FPFH_DIM = 33
_NB = 11  # bins per feature


def pair_features(
    p1: jnp.ndarray, n1: jnp.ndarray, p2: jnp.ndarray, n2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Darboux pair features, PCL ``computePairFeatures`` semantics.

    All inputs broadcastable [..., 3]. Returns (alpha, phi, theta, ok) where
    ok=False marks degenerate pairs (zero baseline or normal ∥ baseline),
    which PCL skips.
    """
    d = p2 - p1
    dist = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    du = d / safe[..., None]
    a1 = jnp.sum(n1 * du, axis=-1)
    a2 = jnp.sum(n2 * du, axis=-1)
    # source = the point whose normal is less aligned-orthogonal: PCL swaps
    # when acos|a1| > acos|a2|  ⇔  |a1| < |a2|.
    swap = jnp.abs(a1) < jnp.abs(a2)
    ns = jnp.where(swap[..., None], n2, n1)
    nt = jnp.where(swap[..., None], n1, n2)
    du = jnp.where(swap[..., None], -du, du)
    phi = jnp.where(swap, -a2, a1)

    v = jnp.cross(du, ns)
    vn = jnp.linalg.norm(v, axis=-1)
    ok = (dist > 1e-9) & (vn > 1e-9)
    v = v / jnp.maximum(vn, 1e-12)[..., None]
    w = jnp.cross(ns, v)
    alpha = jnp.sum(v * nt, axis=-1)
    theta = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(ns * nt, axis=-1))
    return alpha, phi, theta, ok


def _hard_bins(alpha, phi, theta):
    """Feature values → integer bins (PCL floor + clamp)."""
    ba = jnp.clip(jnp.floor(_NB * (alpha + 1.0) * 0.5), 0, _NB - 1).astype(jnp.int32)
    bp = jnp.clip(jnp.floor(_NB * (phi + 1.0) * 0.5), 0, _NB - 1).astype(jnp.int32)
    bt = jnp.clip(
        jnp.floor(_NB * (theta + jnp.pi) / (2.0 * jnp.pi)), 0, _NB - 1
    ).astype(jnp.int32)
    return ba, bp, bt


def spfh(
    query_xyz: jnp.ndarray,
    query_normals: jnp.ndarray,
    query_mask: jnp.ndarray,
    surface_xyz: jnp.ndarray,
    surface_normals: jnp.ndarray,
    surface_mask: jnp.ndarray,
    radius: float,
    k_max: int,
) -> jnp.ndarray:
    """Simplified Point Feature Histograms, [M, 33].

    Blocks sum to ``100 · n_accumulated / n_nonself`` (= 100 exactly when
    no pair hits the degeneracy guard — PCL's denominator convention, see
    module docstring)."""
    idx, within, dist_sq = radius_neighbors(
        query_xyz, surface_xyz, radius, k_max,
        source_mask=surface_mask, exclude_self=query_xyz is surface_xyz,
    )
    nxyz = surface_xyz[idx]
    nnrm = surface_normals[idx]
    alpha, phi, theta, ok = pair_features(
        query_xyz[:, None, :], query_normals[:, None, :], nxyz, nnrm
    )
    nonself = within & (dist_sq > 1e-18) & query_mask[:, None]
    valid = nonself & ok
    ba, bp, bt = _hard_bins(alpha, phi, theta)
    w = valid.astype(jnp.float32)
    # PCL hist_incr: 100 / (#non-self neighbors), degenerate pairs included
    cnt = jnp.maximum(jnp.sum(nonself.astype(jnp.float32), axis=1), 1.0)
    incr = 100.0 / cnt
    oh = lambda b: jax.nn.one_hot(b, _NB, dtype=jnp.float32)
    ha = jnp.sum(oh(ba) * w[..., None], axis=1) * incr[:, None]
    hp = jnp.sum(oh(bp) * w[..., None], axis=1) * incr[:, None]
    ht = jnp.sum(oh(bt) * w[..., None], axis=1) * incr[:, None]
    # PCL block order: [θ | α | φ] (see module docstring)
    return jnp.concatenate([ht, ha, hp], axis=-1)


@functools.partial(jax.jit, static_argnames=("radius", "k_max"))
def compute_fpfh(
    keypoints: Cloud,
    keypoint_normals: jnp.ndarray,
    surface: Cloud,
    surface_normals: jnp.ndarray,
    radius: float,
    k_max: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPFH-33 for keypoints against a search surface.

    Returns (desc float32[M, 33], valid bool[M]). PCL-algorithm parity
    (cross-implementation, pinned by tests/test_golden_descriptors.py): the
    output
    is the 1/d²-weighted sum of the radius NEIGHBORS' SPFHs — the
    keypoint's own SPFH never enters (``weightPointSPFHSignature`` skips
    ``dists == 0`` and adds no self term) — with each 11-bin block
    normalized to sum 100. ``keypoint_normals`` is kept for interface
    stability (PCL's estimator requires input normals too) but no longer
    affects the descriptor values.
    """
    # SPFH for every surface point (batched; feeds the neighbor mixing).
    surf_spfh = spfh(
        surface.xyz, surface_normals, surface.mask,
        surface.xyz, surface_normals, surface.mask, radius, k_max,
    )
    del keypoint_normals
    # Weight neighbor SPFHs by 1/d² (the search returns squared distances,
    # and PCL's weight is 1/nn_dists — squared — verbatim).
    idx, within, dist_sq = radius_neighbors(
        keypoints.xyz, surface.xyz, radius, k_max, source_mask=surface.mask
    )
    valid = within & keypoints.mask[:, None] & (dist_sq > 1e-12)
    w = jnp.where(valid, 1.0 / jnp.maximum(dist_sq, 1e-12), 0.0)
    raw = jnp.einsum("mk,mkf->mf", w, surf_spfh[idx])
    # renormalize each block to 100
    blocks = raw.reshape(-1, 3, _NB)
    sums = jnp.maximum(jnp.sum(blocks, axis=-1, keepdims=True), 1e-12)
    desc = (blocks / sums * 100.0).reshape(-1, FPFH_DIM)
    has_support = jnp.sum(valid, axis=1) > 0
    ok = keypoints.mask & has_support
    return jnp.where(ok[:, None], desc, 0.0), ok
