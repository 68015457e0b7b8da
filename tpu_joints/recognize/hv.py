"""Global hypothesis verification (SURVEY.md A24).

Counterpart of PCL's ``GlobalHypothesesVerification`` (GO-HV, Aldoma et
al.), used by the reference at ``SHOT_hypothesis.cpp:632-651`` with inlier
threshold 0.005, occlusion threshold 0.001, regularizer 0.001, and clutter
detection *off* (``:56-64``). Given registered instances (already in scene
coordinates after ICP), jointly pick the boolean subset that best explains
the scene:

    cost(active) = - #scene points explained by ≥1 active instance
                   + λ_out · Σ_active #unexplained (visible) model points
                   + λ_mult · #scene points explained by ≥2 active instances

The reference never runs with more than ~8 surviving hypotheses, so the
2^H subsets are evaluated *exhaustively in one batched pass* — a guaranteed
global optimum where PCL runs simulated-annealing/local search. For larger
H a greedy pass would be required; we cap H at 16 statically.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.neighbors import knn


@functools.partial(jax.jit, static_argnames=("chunk",))
def _explained_matrix(
    instances_xyz: jnp.ndarray,
    instances_mask: jnp.ndarray,
    scene: Cloud,
    inlier_threshold: float,
    chunk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For H registered instances [H, Nm, 3]:
    explained[H, Ns] — scene point within inlier threshold of instance h;
    outliers[H] — count of instance model points with no scene support."""
    thr_sq = jnp.float32(inlier_threshold) ** 2

    def per_instance(ixyz, imask):
        d_s, _ = knn(scene.xyz, ixyz, 1, source_mask=imask, chunk=chunk)
        explained = scene.mask & (d_s[:, 0] <= thr_sq)
        d_m, _ = knn(ixyz, scene.xyz, 1, source_mask=scene.mask, chunk=chunk)
        outlier = imask & (d_m[:, 0] > thr_sq)
        return explained, jnp.sum(outlier.astype(jnp.float32))

    return jax.vmap(per_instance)(instances_xyz, instances_mask)


def verify_hypotheses(
    instances_xyz: jnp.ndarray,
    instances_mask: jnp.ndarray,
    instances_valid: jnp.ndarray,
    scene: Cloud,
    inlier_threshold: float = 0.005,
    outlier_regularizer: float = 0.001,
    multiple_assignment_penalty: float = 1.0,
    chunk: int = 1024,
) -> jnp.ndarray:
    """bool[H] — the verified-instance mask (reference 'Instance GOOD!').

    Args:
      instances_xyz: float32[H, Nm, 3] ICP-registered model clouds in scene
        coordinates; instances_mask: bool[H, Nm]; instances_valid: bool[H]
        candidates that exist at all (padding hypotheses are never selected).
    """
    H = instances_xyz.shape[0]
    if H > 16:
        raise ValueError("exhaustive HV capped at 16 hypotheses")
    explained, outliers = _explained_matrix(
        instances_xyz, instances_mask, scene, inlier_threshold, chunk
    )
    explained = explained & instances_valid[:, None]
    outliers = jnp.where(instances_valid, outliers, jnp.inf)

    # stream over the 2^H activation patterns in fixed-size chunks so the
    # [patterns, Ns] coverage matrix never exceeds a few MB
    ex_f = explained.astype(jnp.float32)  # [H, Ns]
    out_vec = jnp.where(jnp.isfinite(outliers), outliers, 0.0)
    n_patterns = 2 ** H
    chunk_p = min(256, n_patterns)
    n_chunks = n_patterns // chunk_p

    def eval_chunk(c):
        patterns = c * chunk_p + jnp.arange(chunk_p, dtype=jnp.uint32)
        bits = (patterns[:, None] >> jnp.arange(H, dtype=jnp.uint32)[None, :]) & 1
        active = bits.astype(bool) & instances_valid[None, :]
        af = active.astype(jnp.float32)
        cover = af @ ex_f  # [chunk_p, Ns] multiplicity
        n_explained = jnp.sum(jnp.minimum(cover, 1.0), axis=1)
        n_multiple = jnp.sum(jnp.maximum(cover - 1.0, 0.0), axis=1)
        cost = (
            -n_explained
            + outlier_regularizer * (af @ out_vec)
            + multiple_assignment_penalty * n_multiple
        )
        # padded-off bits that the pattern wanted on: charge nothing (the
        # masked pattern duplicates a smaller one; dedup is unnecessary)
        j = jnp.argmin(cost)
        return cost[j], active[j]

    costs, actives = jax.lax.map(eval_chunk, jnp.arange(n_chunks, dtype=jnp.uint32))
    best = jnp.argmin(costs)
    return actives[best]
