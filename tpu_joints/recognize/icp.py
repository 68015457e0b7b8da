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


def _rodrigues(omega: jnp.ndarray) -> jnp.ndarray:
    """exp([ω]×) for [..., 3] rotation vectors (series-guarded at θ→0)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-6
    t = jnp.maximum(theta, 1e-20)
    A = jnp.where(small, 1.0 - theta[..., 0] ** 2 / 6.0,
                  jnp.sin(t[..., 0]) / t[..., 0])
    B = jnp.where(small, 0.5 - theta[..., 0] ** 2 / 24.0,
                  (1.0 - jnp.cos(t[..., 0])) / (t[..., 0] ** 2))
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zero, -wz, wy], -1),
        jnp.stack([wz, zero, -wx], -1),
        jnp.stack([-wy, wx, zero], -1),
    ], -2)
    I = jnp.eye(3, dtype=omega.dtype)
    return I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def _plane_delta(moved, q, n, w):
    """Linearized point-to-plane update for one candidate.

    Minimizes Σ w (n·(R p + t − q))² over a twist ξ = (ω, t); rows of the
    normal equations are a = [p×n, n], b = n·(q − p). A tiny Levenberg
    damping keeps the 6×6 solve sane when the correspondences under-constrain
    a direction (e.g. all-chord views: sliding along the cylinder axis is
    genuinely free and should produce a zero step there, not noise).
    """
    r = jnp.sum(n * (q - moved), axis=-1)                     # [N]
    a = jnp.concatenate([jnp.cross(moved, n), n], axis=-1)    # [N, 6]
    wa = a * w[:, None]
    H = wa.T @ a                                              # [6, 6]
    g = wa.T @ r                                              # [6]
    damp = 1e-6 * jnp.trace(H) / 6.0 + 1e-12
    xi = jnp.linalg.solve(H + damp * jnp.eye(6, dtype=H.dtype), g)
    R = _rodrigues(xi[:3])
    delta = jnp.eye(4, dtype=moved.dtype)
    delta = delta.at[:3, :3].set(R)
    delta = delta.at[:3, 3].set(xi[3:])
    return delta


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "max_corr_start", "chunk",
                     "point_to_plane", "with_fitness", "allow_pallas"),
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
    point_to_plane: bool = False,
    target_normals: jnp.ndarray = None,
    with_fitness: bool = True,
    allow_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ICP for C candidate (source, init pose) pairs against one target.

    Args: src_xyz float32[C, N, 3], src_mask bool[C, N], init_T [C, 4, 4].
    With ``point_to_plane=True`` (requires ``target_normals`` float32[Nt, 3]
    aligned with ``target``'s lanes), each step solves the linearized
    point-to-plane system instead of Umeyama — it converges in a few
    iterations where point-to-point crawls (partial overlap + near-symmetric
    cylinders: the restoring force lives in a small minority of
    correspondences, so point-to-point's step shrinks by that minority
    fraction per iteration, while point-to-plane solves for the whole rigid
    motion at once). The reference is point-to-point everywhere (PCL
    ``IterativeClosestPoint``); the plane variant is used for the full-CAD
    polish where the reference compensates with 100 iterations
    (``SHOT.cpp:180``).
    Returns (T [C, 4, 4], fitness [C]).

    TPU-critical design note: the candidate axis is folded into the NN
    query's *row* axis ([C·N, 3] in one :func:`knn` call per iteration)
    instead of ``vmap``-ing the per-candidate ICP. Vmapping the chunked
    top-k scan makes XLA lower it ~90× slower (measured on v5e: 11.2 s vs
    127 ms for the same NN work); batching rows keeps the scan unbatched
    and simply makes the MXU matmuls larger — exactly what the hardware
    wants. Only the tiny per-candidate solves are vmapped.
    """
    C, N, _ = src_xyz.shape
    max_sqs = _corr_thresholds(iterations, max_corr_dist, max_corr_start)
    if point_to_plane and target_normals is None:
        raise ValueError("point_to_plane=True requires target_normals")

    def nn(moved_flat):
        d, i = knn(moved_flat, target.xyz, 1, source_mask=target.mask,
                   chunk=chunk, allow_pallas=allow_pallas)
        return d[:, 0].reshape(C, N), i[:, 0].reshape(C, N)

    def step(Ts, max_sq):
        moved = jnp.einsum("cij,cnj->cni", Ts[:, :3, :3], src_xyz,
                           precision=jax.lax.Precision.HIGHEST) + Ts[:, None, :3, 3]
        dist_sq, nn_idx = nn(moved.reshape(C * N, 3))
        w = (src_mask & (dist_sq <= max_sq) & (dist_sq < _BIG)).astype(jnp.float32)
        if point_to_plane:
            deltas = jax.vmap(_plane_delta)(
                moved, target.xyz[nn_idx], target_normals[nn_idx], w)
        else:
            deltas = jax.vmap(umeyama)(moved, target.xyz[nn_idx], w)
        return jnp.einsum("cij,cjk->cik", deltas, Ts,
                          precision=jax.lax.Precision.HIGHEST), None

    Ts, _ = jax.lax.scan(step, init_T.astype(jnp.float32), max_sqs)

    if not with_fitness:
        # skip the trailing fitness NN round (one sequential ~0.5 ms round
        # at bench shapes) when the caller only needs the poses —
        # config.tier1_skip_view_fitness documents when that is sound
        return Ts, jnp.zeros((C,), jnp.float32)
    moved = jnp.einsum("cij,cnj->cni", Ts[:, :3, :3], src_xyz,
                       precision=jax.lax.Precision.HIGHEST) + Ts[:, None, :3, 3]
    dist_sq, _ = nn(moved.reshape(C * N, 3))
    ok = src_mask & (dist_sq < _BIG)
    w = ok.astype(jnp.float32)
    fit = jnp.sum(dist_sq * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return Ts, fit


def icp_multi_capped(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: Cloud,
    init_T: jnp.ndarray,
    rows_cap: int = 0,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`icp_multi` with the folded NN row count bounded per call.

    ``rows_cap > 0`` splits the candidate axis into equal chunks of at
    most ``rows_cap // N`` candidates and runs them as SEQUENTIAL
    ``icp_multi`` calls of identical shape. Purpose: the TPU runtime's
    multi-Mosaic-program re-execution fault (docs/PERFORMANCE.md "TPU
    runtime fault") forbids a process from alternating Pallas NN kernels
    of different row counts — a wide candidate field (e.g. 16/part
    two-part search: 32×512 = 16384 rows) would otherwise instantiate a
    second program alongside the 8192-row tier-2 call. Chunking trades
    one wide scan for k sequential proven-shape scans (k× the sequential
    NN rounds of this stage — spend only when the candidate width is
    worth the latency). Chunks must divide evenly; uneven C falls back
    to one call (a padded chunk would change the program shape anyway).
    """
    C, N, _ = src_xyz.shape
    per = max(1, rows_cap // N) if rows_cap > 0 else C
    if rows_cap <= 0 or C <= per or C % per:
        return icp_multi(src_xyz, src_mask, target, init_T, **kw)
    Ts, fits = [], []
    for s in range(0, C, per):
        T, f = icp_multi(src_xyz[s:s + per], src_mask[s:s + per],
                         target, init_T[s:s + per], **kw)
        Ts.append(T)
        fits.append(f)
    return jnp.concatenate(Ts), jnp.concatenate(fits)


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


@functools.partial(jax.jit, static_argnames=("clip", "explained_dist",
                                              "chunk", "local"))
def scene_coverage_multi(
    scene: Cloud,
    model_xyz: jnp.ndarray,
    model_mask: jnp.ndarray,
    Ts: jnp.ndarray,
    clip: float = 0.05,
    explained_dist: float = 0.02,
    chunk: int = 2048,
    local: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """How well the model AT EACH POSE explains the scene, for C poses in
    one batched NN query. Returns two [C] arrays:

      * coverage — mean over valid scene points of min(NN-distance² to the
        posed model, ``clip``²): a continuous ranking signal;
      * unexplained — fraction of valid scene points farther than
        ``explained_dist`` from the posed model: an acceptance signal whose
        floor is exactly 0 regardless of the model subsample density (the
        mean's floor is the model's NN spacing², which can sit within an
        order of magnitude of a small stranded feature's signal).

    ``local=True`` restricts the *unexplained* fraction to scene points
    within the model's own bounding radius (+ ``explained_dist``) of the
    candidate's model-frame origin. In a MULTI-INSTANCE scene the global
    fraction is dominated by the other instances' points (a constant
    ~1 − 1/n offset that makes any absolute acceptance gate meaningless —
    the r4 bench disabled the gate for exactly this), while the local
    fraction keeps the single-instance semantics per candidate: a true
    pose explains ~everything near itself, a 180° flip strands its own
    stub inside its own footprint. Single-object scenes are unaffected
    (every scene point is inside the footprint, local == global).
    Coverage (the ranking signal) stays global either way — the other
    instances' clipped contribution is candidate-independent.

    This is the flip discriminator the reference's score2 lacks
    (``SHOT_demo.cpp:669-681`` ranks by model→scene ``getFitnessScore()``):
    the full CAD's *back* half has no scene correspondence at ANY pose, so
    its distance floor dominates model→scene fitness for true pose and
    flipped pose alike — on near-symmetric joints the two land within
    noise of each other. Scene points carry no such blindness: every scene
    point is visible by construction, so a flip that strands the scene's
    stub unexplained pays its full squared distance (measured ~500×
    separation where score2 gave ~1.3×). The ``clip`` bounds what any
    single unexplained point (residual clutter) can contribute.

    TPU formulation: dist(s, T·m) = dist(T⁻¹·s, m) — the pose axis folds
    into the NN *row* axis by moving the scene through each inverse pose,
    so all C poses share one NN query against the STATIC model cloud
    (never vmap the chunked top-k scan — see :func:`icp_multi`).
    """
    from tpu_joints.core.transforms import invert_rigid

    C = Ts.shape[0]
    S = scene.capacity
    inv = jax.vmap(invert_rigid)(Ts)
    moved = jnp.einsum("cij,nj->cni", inv[:, :3, :3], scene.xyz,
                       precision=jax.lax.Precision.HIGHEST) + inv[:, None, :3, 3]
    # allow_pallas=False: this NN's [C·S, Nm] shape differs from the ICP
    # refinement's — a second Mosaic k=1 instantiation alternating with it
    # risks the multi-program re-execution fault (docs/PERFORMANCE.md), and
    # the XLA k=1 path (matmul + row-min, no top-k) is near-equal anyway.
    # Memory bound: the folded query materializes a [C·S, chunk] distance
    # block per scan step — fine at bench shapes (16·2560 rows), but at
    # large scene capacities it reaches GiBs; beyond ~64k rows stream one
    # candidate at a time instead ([S, chunk] blocks, same numerics).
    if C * S <= 65536:
        d, _ = knn(moved.reshape(C * S, 3), model_xyz, 1,
                   source_mask=model_mask, chunk=chunk, allow_pallas=False)
        dist_sq = d[:, 0].reshape(C, S)
    else:
        def one(m):
            dd, _ = knn(m, model_xyz, 1, source_mask=model_mask,
                        chunk=chunk, allow_pallas=False)
            return dd[:, 0]

        dist_sq = jax.lax.map(one, moved)
    w = scene.mask[None, :].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    clipped = jnp.minimum(dist_sq, jnp.float32(clip) ** 2)
    coverage = jnp.sum(clipped * w, axis=1) / denom
    far = (dist_sq > jnp.float32(explained_dist) ** 2).astype(jnp.float32)
    if local:
        r = jnp.sqrt(jnp.max(jnp.where(
            model_mask, jnp.sum(model_xyz * model_xyz, axis=-1), 0.0)))
        r = r + jnp.float32(explained_dist)
        within = jnp.sum(moved * moved, axis=-1) <= r * r   # [C, S]
        lw = w * within.astype(jnp.float32)
        unexplained = (jnp.sum(far * lw, axis=1)
                       / jnp.maximum(jnp.sum(lw, axis=1), 1.0))
    else:
        unexplained = jnp.sum(far * w, axis=1) / denom
    return coverage, unexplained


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
