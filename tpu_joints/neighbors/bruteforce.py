"""Tiled dense neighbor search — the L2 keystone (SURVEY.md A5).

The reference does all neighbor queries through FLANN kd-trees
(``pcl::KdTreeFLANN`` at ``SHOT.cpp:163``, ``SHOT.cpp:405-423``,
``SHOT_VAR.cpp:356``). Trees are pointer-chasing machines; on a TPU the
idiomatic replacement is a *tiled dense distance computation on the MXU*:

    ||q - s||^2 = ||q||^2 + ||s||^2 - 2 q . s

computed chunk-by-chunk over the source axis with a streaming top-k merge, so
the full [M, N] distance matrix never materializes. The same primitive serves
3-D space (normals, ICP, grouping) and descriptor space (352-D/33-D matching,
where the matmul genuinely feeds the MXU). Padded/invalid points carry a
far-away sentinel position (see ``core.cloud.SENTINEL``), so they are
excluded from every neighborhood automatically; we additionally mask by the
explicit validity mask for robustness.

Complexity is O(M·N·D) FLOPs — entirely matmul-shaped. For the reference's
problem sizes (raw scenes ≤ 307k points → ≤ 32k after downsampling, banks of
42×2 views) this is far below one v5e chip's MXU throughput at < 50 ms/scene.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)

# Read once at import: this is consumed at *trace* time inside the jitted
# knn, so a post-import change would be silently ignored by cached
# executables. Import-time snapshot makes the opt-in deterministic.
#
# Default 32 = Pallas for every k ≤ 32 kNN (normals, region growing, ICP).
# Round 1 shipped 1 (ICP only) because the then-current TPU runtime
# intermittently faulted (INVALID_ARGUMENT, context poisoned) when
# certain pairs of distinct Mosaic kNN programs executed in one process
# and one re-executed (the A,B,A pattern; history in docs/PERFORMANCE.md).
# Round 2 re-validated on hardware: 50 alternations of two Mosaic kNN
# programs with *different* tile widths — the historical worst case —
# execute cleanly (tests/test_pallas_stress.py runs the same pattern), so
# the fault is gone from the current runtime and the kernel is on by
# default. Set TPU_JOINTS_PALLAS_MAXK=1 to fall back to the round-1
# minimal-kernel policy, 0 to disable Pallas kNN entirely.
_PALLAS_MAXK = int(os.environ.get("TPU_JOINTS_PALLAS_MAXK", "32"))


def pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense [M, N] squared distances (small inputs only)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    d = a2 + b2.T - 2.0 * (a @ b.T)
    return jnp.maximum(d, 0.0)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _pallas_tile_n(n: int) -> int:
    """Source-tile width for the fused Pallas kernel: minimize padding,
    then maximize width.

    The former fixed tn=2048 rounded a 2560-lane scene up to 4096 — 60%
    pure padding work on EVERY ICP NN query (the latency-dominant stage).
    The width is a deterministic function of the source length (lane
    multiples of 128, ≤ 2048 to stay far from the VMEM ceiling), so a
    given call shape still always produces the same Mosaic program.
    """
    best = (1 << 62, 0)
    for tn in range(128, 2049, 128):
        padded = _round_up(n, tn)
        best = min(best, (padded, -tn))
    return -best[1]


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "exclude_self", "allow_pallas")
)
def knn(
    query: jnp.ndarray,
    source: jnp.ndarray,
    k: int,
    source_mask: Optional[jnp.ndarray] = None,
    exclude_self: bool = False,
    chunk: Optional[int] = None,
    allow_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest source points for each query point.

    Args:
      query:  float[M, D].
      source: float[N, D].
      k: neighbors to return.
      source_mask: bool[N]; invalid sources never match.
      exclude_self: if True, ``query`` is assumed to be a prefix-aligned view
        of ``source`` and source index ``j == i`` is excluded for query ``i``
        (PCL's "nearest other point", used by cloud resolution).
      chunk: source tile size (static); None = auto (8192 for big sources).

    Returns:
      (dist_sq float32[M, k], idx int32[M, k]); lanes with no valid
      neighbor have dist_sq == INF (callers mask on that).

    On TPU the per-block k-selection uses the hardware-accelerated
    ``approx_min_k`` (PartialReduce, default recall ≈ 0.95 within a block;
    k=1 and CPU backends are exact) — the standard accuracy/speed point for
    on-device NN search; the cross-block merge is exact.
    """
    M, D = query.shape
    N = source.shape[0]
    if chunk is None:
        # few big blocks beat many small ones: each block pays a top-k
        # select/merge round (measured 199→116 ms/scene moving 2048→8192).
        # Large k keeps small blocks: approx_min_k's per-block recall loss
        # grows with block width and visibly degrades SHOT supports at k=64.
        chunk = 8192 if (N >= 8192 and k <= 16) else 2048

    if allow_pallas and D == 3 and k <= _PALLAS_MAXK and not exclude_self:
        from tpu_joints.neighbors.pallas_knn import knn_pallas, pallas_available

        if pallas_available():
            # fused Pallas kernel: distance + streaming top-k in VMEM.
            # The tile geometry is a deterministic function of the source
            # length (zero-padding width, see _pallas_tile_n) — NOT derived
            # from `chunk`, which only tunes the XLA fallback path below.
            # Same call shape → same Mosaic program, and the kernel name
            # embeds the geometry, so distinct programs never collide in
            # the runtime's re-execution cache (the round-1 A,B,A fault;
            # tests/test_pallas_stress.py, docs/PERFORMANCE.md).
            return knn_pallas(query, source, k, source_mask=source_mask,
                              tn=_pallas_tile_n(N))
    if source_mask is None:
        source_mask = jnp.ones((N,), bool)

    Np = _round_up(N, chunk)
    pad = Np - N
    if pad:
        source = jnp.concatenate([source, jnp.zeros((pad, D), source.dtype)])
        source_mask = jnp.concatenate([source_mask, jnp.zeros((pad,), bool)])

    n_chunks = Np // chunk
    src_chunks = source.reshape(n_chunks, chunk, D)
    mask_chunks = source_mask.reshape(n_chunks, chunk)

    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # [M, 1]
    qrow = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def step(carry, inp):
        best_d, best_i = carry
        (c_idx, s_c, m_c) = inp
        s2 = jnp.sum(s_c * s_c, axis=-1)  # [chunk]
        # MXU matmul; HIGHEST precision — 3-D geometry needs mm^2-level
        # discrimination (~1e-6 relative), beyond bf16 passes.
        d = q2 + s2[None, :] - 2.0 * jnp.dot(
            query, s_c.T, precision=jax.lax.Precision.HIGHEST
        )
        d = jnp.maximum(d, 0.0)
        d = jnp.where(m_c[None, :], d, INF)
        if exclude_self:
            # global column == query row (only the resolution path uses this)
            col = jax.lax.broadcasted_iota(jnp.int32, (M, chunk), 1) + c_idx * chunk
            d = jnp.where(col == qrow, INF, d)
        # global indices derive from block-local argmins + the chunk offset —
        # never materialize an [M, chunk] index matrix on the hot path
        if k == 1:
            am = jnp.argmin(d, axis=1)[:, None]
            blk_d = jnp.take_along_axis(d, am, axis=1)
            blk_i = am.astype(jnp.int32) + c_idx * chunk
            take = blk_d < best_d
            return (jnp.where(take, blk_d, best_d),
                    jnp.where(take, blk_i, best_i)), None
        # per-block top-k (hardware PartialReduce on TPU via approx_min_k —
        # exact top-k on CPU backends; ~70ms faster than plain top_k at the
        # 32k-scene scale), then an exact 2k-way carry merge
        blk_d, blk_arg = jax.lax.approx_min_k(d, k)
        blk_i = blk_arg.astype(jnp.int32) + c_idx * chunk
        cat_d = jnp.concatenate([best_d, blk_d], axis=1)
        cat_i = jnp.concatenate([best_i, blk_i], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        new_i = jnp.take_along_axis(cat_i, arg, axis=1)
        return (-neg_top, new_i), None

    init = (jnp.full((M, k), INF), jnp.zeros((M, k), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks), src_chunks, mask_chunks)
    )
    return best_d, best_i


def radius_neighbors(
    query: jnp.ndarray,
    source: jnp.ndarray,
    radius: float,
    k_max: int,
    source_mask: Optional[jnp.ndarray] = None,
    exclude_self: bool = False,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-radius search, padded to ``k_max`` per query.

    Returns (idx int32[M, k_max], valid bool[M, k_max], dist_sq f32[M, k_max]).
    Keeps the ``k_max`` *nearest* points inside the radius (PCL's radiusSearch
    with max_nn behaves the same way).
    """
    d, i = knn(query, source, k_max, source_mask=source_mask,
               exclude_self=exclude_self, chunk=chunk)
    valid = d <= jnp.float32(radius) * jnp.float32(radius)
    return i, valid, d
