"""Point-to-point ICP refinement (SURVEY.md A22).

Replaces PCL's ``IterativeClosestPoint`` in its three reference modes:
100-iteration alignment (``SHOT.cpp:177-192``), chained 1-iteration
refinement (``SHOT_demo.cpp:604-633``), and tight
``setMaxCorrespondenceDistance(0.001)`` verification ICP
(``SHOT_hypothesis.cpp:509-515``).

TPU design: a ``lax.scan`` over iterations; each step is one batched NN
query (tiled MXU distance matmul), a masked Umeyama solve, and a 4×4
compose — no data-dependent control flow, so the whole refinement jits into
one fused program. PCL's early-exit epsilons become a no-op naturally: a
converged step yields ~identity updates. Fitness matches PCL's
``getFitnessScore()``: mean *squared* NN distance over source points whose
NN lies within ``max_range`` (the acceptance gates ≤ 0.001 / < 0.006 in the
reference are on this quantity).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.core.transforms import transform_points, umeyama
from tpu_joints.neighbors import knn

_BIG = 3.0e38


def _nn_correspondences(src_xyz, src_mask, dst_xyz, dst_mask, chunk):
    d, i = knn(src_xyz, dst_xyz, 1, source_mask=dst_mask, chunk=chunk)
    return d[:, 0], i[:, 0]


def _corr_thresholds(iterations: int, max_corr_dist: float,
                     max_corr_start: float) -> jnp.ndarray:
    """Per-iteration squared correspondence gates.

    A coarse-to-fine geometric schedule from ``max_corr_start`` down to
    ``max_corr_dist``: early iterations keep a wide basin (a Hough
    initialization can sit several cm off), late iterations trim
    non-overlap/occluded correspondences, which otherwise drag partial-view
    alignments along the cloud's near-symmetry modes (the chord cylinder's
    axis). ``max_corr_start <= 0`` keeps PCL's constant gate.
    """
    end = jnp.float32(max_corr_dist)
    if max_corr_start <= 0.0 or iterations <= 1:
        d = jnp.full((iterations,), end)
    else:
        start = jnp.float32(max_corr_start)
        t = jnp.arange(iterations, dtype=jnp.float32) / (iterations - 1)
        d = start * (end / start) ** t
    return d * d


@functools.partial(
    jax.jit, static_argnames=("iterations", "max_corr_start", "chunk")
)
def icp(
    source: Cloud,
    target: Cloud,
    init_T: jnp.ndarray,
    iterations: int = 100,
    max_corr_dist: float = _BIG,
    max_corr_start: float = 0.0,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align ``source`` to ``target`` starting from ``init_T``.

    Returns (T float32[4,4] total model→target transform including init_T,
    fitness float32 — PCL-style mean squared NN distance after the final
    iteration).
    """
    max_sqs = _corr_thresholds(iterations, max_corr_dist, max_corr_start)

    def step(T, max_sq):
        moved = transform_points(source.xyz, T)
        dist_sq, nn = _nn_correspondences(moved, source.mask, target.xyz, target.mask, chunk)
        w = (source.mask & (dist_sq <= max_sq) & (dist_sq < _BIG)).astype(jnp.float32)
        delta = umeyama(moved, target.xyz[nn], w)
        return delta @ T, None

    T, _ = jax.lax.scan(step, init_T.astype(jnp.float32), max_sqs)
    fit = fitness_score(source, target, T, chunk=chunk)
    return T, fit


@functools.partial(
    jax.jit, static_argnames=("iterations", "max_corr_start", "chunk")
)
def icp_multi(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: Cloud,
    init_T: jnp.ndarray,
    iterations: int = 30,
    max_corr_dist: float = _BIG,
    max_corr_start: float = 0.0,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ICP for C candidate (source, init pose) pairs against one target.

    Args: src_xyz float32[C, N, 3], src_mask bool[C, N], init_T [C, 4, 4].
    Returns (T [C, 4, 4], fitness [C]).

    TPU-critical design note: the candidate axis is folded into the NN
    query's *row* axis ([C·N, 3] in one :func:`knn` call per iteration)
    instead of ``vmap``-ing the per-candidate ICP. Vmapping the chunked
    top-k scan makes XLA lower it ~90× slower (measured on v5e: 11.2 s vs
    127 ms for the same NN work); batching rows keeps the scan unbatched
    and simply makes the MXU matmuls larger — exactly what the hardware
    wants. Only the tiny per-candidate Umeyama solves are vmapped.
    """
    C, N, _ = src_xyz.shape
    max_sqs = _corr_thresholds(iterations, max_corr_dist, max_corr_start)

    def nn(moved_flat):
        d, i = knn(moved_flat, target.xyz, 1, source_mask=target.mask, chunk=chunk)
        return d[:, 0].reshape(C, N), i[:, 0].reshape(C, N)

    def step(Ts, max_sq):
        moved = jnp.einsum("cij,cnj->cni", Ts[:, :3, :3], src_xyz,
                           precision=jax.lax.Precision.HIGHEST) + Ts[:, None, :3, 3]
        dist_sq, nn_idx = nn(moved.reshape(C * N, 3))
        w = (src_mask & (dist_sq <= max_sq) & (dist_sq < _BIG)).astype(jnp.float32)
        deltas = jax.vmap(umeyama)(moved, target.xyz[nn_idx], w)
        return jnp.einsum("cij,cjk->cik", deltas, Ts,
                          precision=jax.lax.Precision.HIGHEST), None

    Ts, _ = jax.lax.scan(step, init_T.astype(jnp.float32), max_sqs)

    moved = jnp.einsum("cij,cnj->cni", Ts[:, :3, :3], src_xyz,
                       precision=jax.lax.Precision.HIGHEST) + Ts[:, None, :3, 3]
    dist_sq, _ = nn(moved.reshape(C * N, 3))
    ok = src_mask & (dist_sq < _BIG)
    w = ok.astype(jnp.float32)
    fit = jnp.sum(dist_sq * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return Ts, fit


@functools.partial(jax.jit, static_argnames=("chunk",))
def fitness_multi(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: Cloud,
    Ts: jnp.ndarray,
    chunk: int = 2048,
) -> jnp.ndarray:
    """PCL fitness of ONE source cloud at C poses, in one batched NN query.

    Used to rank pose candidates by the reference's score2 semantics — the
    fit of the FULL CAD model (``SHOT_demo.cpp:669-681``), which a
    partial-view fitness can't provide: a mostly-chord view slides freely
    along the chord cylinder's symmetry axis and outscores the correct
    view. Pose axis folded into NN rows (never vmap the chunked top-k scan
    — see :func:`icp_multi`).
    """
    C = Ts.shape[0]
    N = src_xyz.shape[0]
    moved = jnp.einsum("cij,nj->cni", Ts[:, :3, :3], src_xyz,
                       precision=jax.lax.Precision.HIGHEST) + Ts[:, None, :3, 3]
    d, _ = knn(moved.reshape(C * N, 3), target.xyz, 1,
               source_mask=target.mask, chunk=chunk)
    dist_sq = d[:, 0].reshape(C, N)
    w = (src_mask[None, :] & (dist_sq < _BIG)).astype(jnp.float32)
    return jnp.sum(dist_sq * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def fitness_score(
    source: Cloud,
    target: Cloud,
    T: jnp.ndarray,
    max_range: float = _BIG,
    chunk: int = 2048,
) -> jnp.ndarray:
    """PCL ``getFitnessScore``: mean squared NN distance of transformed
    source points onto the target, over pairs closer than ``max_range``."""
    moved = transform_points(source.xyz, T)
    dist_sq, _ = _nn_correspondences(moved, source.mask, target.xyz, target.mask, chunk)
    ok = source.mask & (dist_sq < jnp.float32(max_range) ** 2) & (dist_sq < _BIG)
    w = ok.astype(jnp.float32)
    return jnp.sum(dist_sq * w) / jnp.maximum(jnp.sum(w), 1.0)
