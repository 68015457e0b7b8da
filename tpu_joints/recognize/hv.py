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
global optimum where PCL runs simulated-annealing/local search. Above
H = 16 (e.g. the multi-part path's P·C pooled candidates) the exhaustive
sweep gives way to batched single-flip local search from the empty set —
the same regime PCL's metaheuristic operates in, evaluated H flips at a
time as one [H, Ns] matmul per step.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.neighbors import knn


def scene_depth_buffer(
    scene: Cloud,
    bins: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Coarse perspective z-buffer of the scene from the origin viewpoint.

    PCL's hypothesis verification reasons about occlusion against the
    *organized* scene cloud (``HypothesisVerification`` projects each model
    point into the sensor image and compares depths with
    ``occlusion_thres`` — the reference sets 0.001 at
    ``SHOT_hypothesis.cpp:58``). The working set here is unordered, so the
    depth image is rebuilt on device: scene points are binned by their ray
    direction (x/z, y/z — a pinhole image whose extent adapts to the
    data), and a scatter-min keeps the nearest depth per bin.

    Returns (depth [bins·bins] min-z per bin with +inf for empty,
             lo [2], scale [2]) — the (u, v) binning transform.
    """
    x, y, z = scene.xyz[:, 0], scene.xyz[:, 1], scene.xyz[:, 2]
    ok = scene.mask & (z > 1e-6)
    u = jnp.where(ok, x / jnp.maximum(z, 1e-6), 0.0)
    v = jnp.where(ok, y / jnp.maximum(z, 1e-6), 0.0)
    big = jnp.float32(3e38)
    lo = jnp.stack([jnp.min(jnp.where(ok, u, big)),
                    jnp.min(jnp.where(ok, v, big))])
    hi = jnp.stack([jnp.max(jnp.where(ok, u, -big)),
                    jnp.max(jnp.where(ok, v, -big))])
    scale = (bins - 1) / jnp.maximum(hi - lo, 1e-6)
    ui = jnp.clip(((u - lo[0]) * scale[0]).astype(jnp.int32), 0, bins - 1)
    vi = jnp.clip(((v - lo[1]) * scale[1]).astype(jnp.int32), 0, bins - 1)
    flat = vi * bins + ui
    depth = jnp.full((bins * bins,), big, jnp.float32)
    depth = depth.at[flat].min(jnp.where(ok, z, big))
    # close the gaps a sparse working set leaves between bins: min-dilate
    # so each point's surface footprint covers its neighborhood (PCL reads
    # a DENSE organized cloud here; the working set is ~100× sparser).
    # Conservative for occlusion: dilation can only move depths nearer.
    img = depth.reshape(bins, bins)
    for _ in range(2):
        img = jax.lax.reduce_window(img, big, jax.lax.min,
                                    (3, 3), (1, 1), "SAME")
    return img.reshape(bins * bins), lo, scale


def _occluded(
    xyz: jnp.ndarray,
    depth: jnp.ndarray,
    lo: jnp.ndarray,
    scale: jnp.ndarray,
    occlusion_threshold: float,
    bins: int,
) -> jnp.ndarray:
    """bool[...]: point lies behind the scene surface seen from the origin."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    zs = jnp.maximum(z, 1e-6)
    ui = jnp.clip(((x / zs - lo[0]) * scale[0]).astype(jnp.int32), 0, bins - 1)
    vi = jnp.clip(((y / zs - lo[1]) * scale[1]).astype(jnp.int32), 0, bins - 1)
    front = depth[vi * bins + ui]
    return (z > front + jnp.float32(occlusion_threshold)) & (front < 1e38)


@functools.partial(
    jax.jit, static_argnames=("chunk", "occlusion_threshold", "bins")
)
def _explained_matrix(
    instances_xyz: jnp.ndarray,
    instances_mask: jnp.ndarray,
    scene: Cloud,
    inlier_threshold: float,
    chunk: int = 1024,
    occlusion_threshold: float = 0.0,
    bins: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For H registered instances [H, Nm, 3]:
    explained[H, Ns] — scene point within inlier threshold of instance h;
    outliers[H] — count of *visible* instance model points with no scene
    support. With ``occlusion_threshold > 0``, model points behind the
    scene's depth buffer (self-occluded backsides, points hidden by other
    objects) are exempt from outlier counting — PCL's occlusion reasoning
    (``SHOT_hypothesis.cpp:56-64``); without it a full-model hypothesis
    whose far side is legitimately invisible drowns in false outliers."""
    thr_sq = jnp.float32(inlier_threshold) ** 2
    if occlusion_threshold > 0.0:
        depth, lo, scale = scene_depth_buffer(scene, bins)
    else:
        depth = lo = scale = None

    def per_instance(ixyz, imask):
        # allow_pallas=False: HV runs once per detection and its NN shapes
        # differ from the ICP refinement's — a second Mosaic k=1 program
        # alternating with the ICP kernel trips the TPU runtime's
        # re-execution fault (docs/PERFORMANCE.md; measured on the r5
        # hv-on multi-instance bench: first execution fine, re-execution
        # after the hv-off program INVALID_ARGUMENT). The XLA k=1 path is
        # near-equal for a once-per-frame stage.
        d_s, _ = knn(scene.xyz, ixyz, 1, source_mask=imask, chunk=chunk,
                     allow_pallas=False)
        explained = scene.mask & (d_s[:, 0] <= thr_sq)
        d_m, _ = knn(ixyz, scene.xyz, 1, source_mask=scene.mask, chunk=chunk,
                     allow_pallas=False)
        outlier = imask & (d_m[:, 0] > thr_sq)
        if occlusion_threshold > 0.0:
            outlier = outlier & ~_occluded(
                ixyz, depth, lo, scale, occlusion_threshold, bins)
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
    occlusion_threshold: float = 0.0,
) -> jnp.ndarray:
    """bool[H] — the verified-instance mask (reference 'Instance GOOD!').

    Args:
      instances_xyz: float32[H, Nm, 3] ICP-registered model clouds in scene
        coordinates; instances_mask: bool[H, Nm]; instances_valid: bool[H]
        candidates that exist at all (padding hypotheses are never selected).
      occlusion_threshold: > 0 enables PCL's occlusion exemption (depth
        slack in meters, reference 0.001 at ``SHOT_hypothesis.cpp:58``):
        model points hidden behind the scene's viewpoint depth buffer are
        not counted as outliers. Scene must be in camera coordinates with
        the viewpoint at the origin (the reference's convention throughout).
    """
    H = instances_xyz.shape[0]
    explained, outliers = _explained_matrix(
        instances_xyz, instances_mask, scene, inlier_threshold, chunk,
        occlusion_threshold=occlusion_threshold,
    )
    explained = explained & instances_valid[:, None]
    outliers = jnp.where(instances_valid, outliers, jnp.inf)

    if H > 16:
        # 2^H is no longer enumerable: batched single-flip local search
        # from the empty set (PCL's own local-optimization regime,
        # ``SHOT_hypothesis.cpp:632-651``). Each step evaluates all H
        # one-bit flips as one [H, Ns] coverage matmul and takes the best
        # improving move; 2H steps suffice for any greedy-monotone path.
        return _greedy_verify(
            explained, outliers, instances_valid,
            outlier_regularizer, multiple_assignment_penalty)

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


@jax.jit
def _greedy_verify(
    explained: jnp.ndarray,       # bool[H, Ns], already masked by validity
    outliers: jnp.ndarray,        # f32[H], inf for invalid hypotheses
    valid: jnp.ndarray,           # bool[H]
    outlier_regularizer: float,
    multiple_assignment_penalty: float,
) -> jnp.ndarray:
    H = explained.shape[0]
    ex_f = explained.astype(jnp.float32)                     # [H, Ns]
    out_vec = jnp.where(jnp.isfinite(outliers), outliers, 0.0)

    def cost_of(active_f):                                   # [..., H] → [...]
        cover = active_f @ ex_f                              # [..., Ns]
        return (
            -jnp.sum(jnp.minimum(cover, 1.0), axis=-1)
            + outlier_regularizer * (active_f @ out_vec)
            + multiple_assignment_penalty
            * jnp.sum(jnp.maximum(cover - 1.0, 0.0), axis=-1)
        )

    eye = jnp.eye(H, dtype=bool)

    def body(_, state):
        active, cost = state
        # flipping an invalid bit is a no-op (its flip duplicates `active`
        # and can never strictly improve), so invalid bits stay off
        flips = jnp.logical_xor(active[None, :], eye) & valid[None, :]
        costs = cost_of(flips.astype(jnp.float32))           # [H]
        j = jnp.argmin(costs)
        better = costs[j] < cost - 1e-6
        return (jnp.where(better, flips[j], active),
                jnp.where(better, costs[j], cost))

    active0 = jnp.zeros((H,), bool)
    active, _ = jax.lax.fori_loop(
        0, 2 * H, body, (active0, cost_of(active0.astype(jnp.float32))))
    return active
