"""Voxel-hash fixed-radius neighbor search (SURVEY.md A5, L2 keystone).

The dense tiled search (``bruteforce.knn``) does O(M·N) distance work; for
bounded-radius queries a voxel hash cuts that to O(M·27·L): points are
bucketed by a spatial hash of their cell, sorted once, and each query
gathers candidates only from the 27 cells that can contain a neighbor
within ``radius`` (cell edge = radius ⇒ any in-radius point lies in the
3×3×3 cell neighborhood).

All shapes are static and TPU-friendly: the sort is one device sort; the
27 bucket lookups are batched binary searches (``searchsorted``); candidate
windows are fixed-width gathers (``L`` per bucket) and the final selection
is one small top-k over 27·L candidates.

Approximation contract (documented, test-bounded):
  * a bucket holding more than ``L`` points contributes only its first
    ``L`` (callers size L from expected occupancy: points-per-cell ≈
    density·radius³, ×2 safety);
  * distinct cells may share a bucket (hash collision); colliding foreign
    points are culled by the radius test but occupy candidate slots. The
    table is sized 4× the point count to keep collisions rare.
With adequate ``L`` the result equals the dense search (asserted in tests).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)

# large odd primes for the 3-D cell hash (standard spatial-hash constants)
_P1, _P2, _P3 = 73856093, 19349663, 83492791


class VoxelGrid(NamedTuple):
    """Sorted spatial-hash index over a fixed-capacity point set."""

    xyz: jnp.ndarray        # [N, 3] points in bucket-sorted order
    order: jnp.ndarray      # int32[N] sorted position → original index
    hashes: jnp.ndarray     # int32[N] bucket id per sorted point (T = invalid)
    cell_size: jnp.ndarray  # f32 scalar
    table_size: int         # static


def _cell_hash(cell: jnp.ndarray, table_size: int) -> jnp.ndarray:
    h = (cell[..., 0] * _P1) ^ (cell[..., 1] * _P2) ^ (cell[..., 2] * _P3)
    return jnp.abs(h) % table_size


@functools.partial(jax.jit, static_argnames=("table_size",))
def build_grid(
    xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    cell_size: float = 0.05,
    table_size: int = 0,
) -> VoxelGrid:
    """One sort builds the whole index (rebuild per cloud; O(N log N))."""
    N = xyz.shape[0]
    if table_size == 0:
        table_size = 4 * N
    if mask is None:
        mask = jnp.ones((N,), bool)
    cell = jnp.floor(xyz / cell_size).astype(jnp.int32)
    h = _cell_hash(cell, table_size)
    h = jnp.where(mask, h, table_size)  # invalid points sort to the end
    order = jnp.argsort(h).astype(jnp.int32)
    return VoxelGrid(
        xyz=xyz[order],
        order=order,
        hashes=h[order].astype(jnp.int32),
        cell_size=jnp.float32(cell_size),
        table_size=table_size,
    )


_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)  # [27, 3]


def max_cell_occupancy(grid: VoxelGrid) -> jnp.ndarray:
    """Largest number of points sharing one hash bucket (collision chains
    included) — the lower bound for a loss-free ``bucket_cap``. At bench
    density (32k joint, cell = radius = 0.02) cells hold up to ~80 points,
    so the round-1 default cap of 8 silently dropped ~75% of in-radius
    neighbors; size ``bucket_cap`` ≥ this value (+ margin for collision
    chains) or shrink ``cell_size``."""
    return _max_cell_occupancy(grid.hashes, int(grid.table_size))


@functools.partial(jax.jit, static_argnames=("table_size",))
def _max_cell_occupancy(hashes: jnp.ndarray, table_size: int) -> jnp.ndarray:
    # segment over the HASH-ID space: bucket ids range over [0, table_size),
    # not [0, n) — clamping them into the point-count range collapses every
    # high bucket into one segment and overestimates ~200× (round-2 advisor)
    valid = hashes < table_size
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), jnp.where(valid, hashes, 0),
        num_segments=table_size)
    return jnp.max(counts)


@functools.partial(
    jax.jit, static_argnames=("k_max", "bucket_cap", "query_chunk"))
def grid_radius_neighbors(
    grid: VoxelGrid,
    query: jnp.ndarray,
    radius: float,
    k_max: int,
    bucket_cap: int = 32,
    query_chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-radius search through the grid (radius must be ≤ cell_size).

    Returns (idx int32[M, k_max] — ORIGINAL point indices, valid bool,
    dist_sq f32), the same contract as ``bruteforce.radius_neighbors``
    (keeps the nearest k_max within the radius).

    ``query_chunk`` > 0 streams queries in blocks of that size (lax.map):
    the candidate window [chunk, 27·bucket_cap, 3] is the peak live
    buffer, so large query sets don't materialize hundreds of MB of
    gathered candidates at once (8192 queries × cap 160 would be ~425 MB
    unchunked — measured OOM on v5e).
    """
    M = query.shape[0]
    if query_chunk and M > query_chunk:
        pad = (-M) % query_chunk
        qp = jnp.pad(query, ((0, pad), (0, 0)), constant_values=1.0e9)
        blocks = qp.reshape(-1, query_chunk, 3)
        idx, valid, dist_sq = jax.lax.map(
            lambda qb: grid_radius_neighbors(
                grid, qb, radius, k_max, bucket_cap=bucket_cap), blocks)
        flat = lambda a: a.reshape(-1, a.shape[-1])[:M]
        return flat(idx), flat(valid), flat(dist_sq)
    qcell = jnp.floor(query / grid.cell_size).astype(jnp.int32)  # [M, 3]
    cells = qcell[:, None, :] + _OFFSETS[None, :, :]             # [M, 27, 3]
    h = _cell_hash(cells, grid.table_size)                        # [M, 27]

    # distinct neighbor cells may share a bucket (hash collision); their
    # candidate windows are then identical, and duplicates would crowd real
    # neighbors out of the final top-k — keep only the first occurrence of
    # each bucket among the 27 offsets (its window already holds both cells)
    dup = (h[:, :, None] == h[:, None, :]) & (
        jnp.arange(27)[None, :, None] > jnp.arange(27)[None, None, :]
    )
    first_occurrence = ~jnp.any(dup, axis=2)                      # [M, 27]

    start = jnp.searchsorted(grid.hashes, h).astype(jnp.int32)    # [M, 27]
    lanes = jnp.arange(bucket_cap, dtype=jnp.int32)               # [L]
    widx = start[..., None] + lanes[None, None, :]                # [M, 27, L]
    widx = jnp.clip(widx, 0, grid.hashes.shape[0] - 1)
    same = (grid.hashes[widx] == h[..., None]) & first_occurrence[..., None]

    cand = widx.reshape(M, -1)                                    # [M, 27L]
    ok = same.reshape(M, -1)
    cxyz = grid.xyz[cand]                                         # [M, 27L, 3]
    d = jnp.sum((cxyz - query[:, None, :]) ** 2, axis=-1)
    r2 = jnp.float32(radius) * jnp.float32(radius)
    d = jnp.where(ok & (d <= r2), d, INF)

    k = min(k_max, cand.shape[1])
    neg, arg = jax.lax.top_k(-d, k)
    dist_sq = -neg
    idx_sorted = jnp.take_along_axis(cand, arg, axis=1)
    idx = grid.order[idx_sorted]
    valid = dist_sq <= r2
    if k < k_max:  # pad out to the requested width
        pad = k_max - k
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
        dist_sq = jnp.pad(dist_sq, ((0, 0), (0, pad)), constant_values=3.0e38)
    return idx, valid, dist_sq
