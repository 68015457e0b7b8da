"""Ring-sharded neighbor search for clouds larger than one chip's HBM.

SURVEY.md §2.3 calls this the point-cloud analog of ring attention /
context parallelism: the reference copes with its 307k-point organized
scenes (``crop_pcd.cpp:76-77``) purely by downsampling on one CPU; here a
giant cloud is sharded point-wise across the mesh and each device's query
shard sees every source shard by rotating source blocks around the ring
with ``lax.ppermute`` (ICI neighbor exchange), merging a running top-k.

Per step each chip overlaps one MXU distance matmul on the resident block
with the transfer of the next block — bandwidth-optimal: every source
point crosses each ICI link exactly once, and the full [M, N] distance
matrix never exists anywhere.

Used by :func:`ring_knn`; the same pattern extends to sharded ICP (NN
correspondences of a sharded model against a sharded scene).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

INF = jnp.float32(3.0e38)


def _local_topk_merge(query, q2, best_d, best_i, s_blk, m_blk, base, k):
    """Merge the distances to one source block into the running top-k."""
    s2 = jnp.sum(s_blk * s_blk, axis=-1)
    d = q2 + s2[None, :] - 2.0 * jnp.dot(
        query, s_blk.T, precision=jax.lax.Precision.HIGHEST
    )
    d = jnp.maximum(d, 0.0)
    d = jnp.where(m_blk[None, :], d, INF)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + base
    cat_d = jnp.concatenate([best_d, d], axis=1)
    cat_i = jnp.concatenate([best_i, col], axis=1)
    neg, arg = jax.lax.top_k(-cat_d, k)
    return -neg, jnp.take_along_axis(cat_i, arg, axis=1)


def ring_knn(
    query: jnp.ndarray,
    source: jnp.ndarray,
    source_mask: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "model",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN where both query and source are sharded point-wise over ``axis``.

    Args:
      query:  float32[M, D], shardable on axis 0 (M % n_devices == 0).
      source: float32[N, D], shardable on axis 0.
      source_mask: bool[N].
      k: neighbors per query.
      mesh: mesh containing ``axis``.

    Returns:
      (dist_sq float32[M, k], idx int32[M, k]) — indices are *global* source
      row numbers; output is sharded like ``query``.
    """
    n_dev = mesh.shape[axis]
    n_local = source.shape[0] // n_dev

    def shard_fn(q, s, m):
        me = jax.lax.axis_index(axis)
        q2 = jnp.sum(q * q, axis=-1, keepdims=True)
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

        best_d = jnp.full((q.shape[0], k), INF)
        best_i = jnp.zeros((q.shape[0], k), jnp.int32)
        owner = me
        s_cur, m_cur = s, m
        for step in range(n_dev):
            best_d, best_i = _local_topk_merge(
                q, q2, best_d, best_i, s_cur, m_cur, owner * n_local, k
            )
            if step + 1 < n_dev:
                s_cur = jax.lax.ppermute(s_cur, axis, perm)
                m_cur = jax.lax.ppermute(m_cur, axis, perm)
                owner = jax.lax.ppermute(owner, axis, perm)
        return best_d, best_i

    specs = {a: None for a in mesh.axis_names}
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return fn(query, source, source_mask)


def _ring_nn1_with_coords(q, s, m, axis, n_dev):
    """Top-1 NN of local queries against the full ring of source blocks,
    carrying the matched COORDINATES through the ring (each device only
    ever holds one source block, so the winner's xyz must travel with the
    running best — indices alone would dangle)."""
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
    best_d = jnp.full((q.shape[0],), INF)
    best_q = jnp.zeros((q.shape[0], 3), q.dtype)
    s_cur, m_cur = s, m
    for step in range(n_dev):
        s2 = jnp.sum(s_cur * s_cur, axis=-1)
        d = q2 + s2[None, :] - 2.0 * jnp.dot(
            q, s_cur.T, precision=jax.lax.Precision.HIGHEST)
        d = jnp.where(m_cur[None, :], jnp.maximum(d, 0.0), INF)
        j = jnp.argmin(d, axis=1)
        dj = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
        closer = dj < best_d
        best_d = jnp.where(closer, dj, best_d)
        best_q = jnp.where(closer[:, None], s_cur[j], best_q)
        if step + 1 < n_dev:
            s_cur = jax.lax.ppermute(s_cur, axis, perm)
            m_cur = jax.lax.ppermute(m_cur, axis, perm)
    return best_d, best_q


def ring_icp(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    iterations: int = 10,
    max_corr_dist: float = 3.0e38,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point-to-point ICP with BOTH clouds sharded point-wise over ``axis``
    — the sharded-ICP design promised alongside :func:`ring_knn`
    (SURVEY.md §2.3 CP-analog; the giant-cloud regime where neither the
    scene nor even the correspondence set fits one chip).

    Per iteration:
      1. each device's source rows find their scene NN by rotating target
         blocks around the ring (coordinates ride along — see
         ``_ring_nn1_with_coords``), so every target point crosses each ICI
         link exactly once and no device ever materializes the full cloud;
      2. the rigid update is solved from ``psum``-reduced Umeyama moments
         (Σw, Σw·p, Σw·q, Σw·p·qᵀ are linear in the data, so the collective
         is four small reductions); every device then runs the same tiny
         3×3 SVD and applies the identical update — the pose is replicated
         by construction, never broadcast.

    Args (all sharded over axis 0; sizes divisible by the mesh axis):
      src_xyz float32[M, 3], src_mask bool[M] — the model being aligned.
      target float32[N, 3], target_mask bool[N] — the scene.

    Returns (T float32[4, 4] replicated, fitness float32 — PCL-style mean
    squared inlier NN distance at the final pose).
    """
    n_dev = mesh.shape[axis]
    max_sq = jnp.float32(min(max_corr_dist, 1.0e19)) ** 2

    def shard_fn(s, sm, t, tm):
        smf = sm.astype(jnp.float32)

        def step(T, _):
            moved = s @ T[:3, :3].T + T[:3, 3]
            d, q = _ring_nn1_with_coords(moved, t, tm, axis, n_dev)
            w = smf * (d <= max_sq) * (d < INF)
            # psum'd Umeyama moments → identical rigid update everywhere
            wsum = jax.lax.psum(jnp.sum(w), axis)
            p_bar = jax.lax.psum(jnp.sum(w[:, None] * moved, 0), axis)
            q_bar = jax.lax.psum(jnp.sum(w[:, None] * q, 0), axis)
            wsafe = jnp.maximum(wsum, 1e-12)
            p_bar, q_bar = p_bar / wsafe, q_bar / wsafe
            H = jax.lax.psum(
                jnp.einsum("ni,nj->ij", w[:, None] * (moved - p_bar),
                           q - q_bar), axis)
            U, _, Vt = jnp.linalg.svd(H)
            det = jnp.linalg.det(Vt.T @ U.T)
            S = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(
                jnp.sign(det))
            R = Vt.T @ S @ U.T
            tr = q_bar - R @ p_bar
            delta = jnp.eye(4, dtype=T.dtype)
            delta = delta.at[:3, :3].set(R).at[:3, 3].set(tr)
            return delta @ T, None

        T0 = jnp.eye(4, dtype=jnp.float32)
        T, _ = jax.lax.scan(step, T0, None, length=iterations)
        # PCL fitness at the final pose (inlier mean squared NN distance)
        moved = s @ T[:3, :3].T + T[:3, 3]
        d, _q = _ring_nn1_with_coords(moved, t, tm, axis, n_dev)
        w = smf * (d <= max_sq) * (d < INF)
        num = jax.lax.psum(jnp.sum(w * jnp.minimum(d, 1e30)), axis)
        den = jnp.maximum(jax.lax.psum(jnp.sum(w), axis), 1.0)
        return T, num / den

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(src_xyz, src_mask, target, target_mask)


def halo_radius_neighbors(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    k_max: int,
    mesh: Mesh,
    axis: str = "model",
    halo: int = 256,
    slab_axis: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-radius self-neighborhoods of a slab-sharded giant cloud with
    BOUNDARY-ONLY halo exchange — the promised CP-analog refinement of
    :func:`ring_knn` (SURVEY.md §2.3/§5; VERDICT round-2 item 5).

    ``ring_knn`` rotates entire source blocks around the ring: every point
    crosses every ICI link (O(N) traffic per device) — correct at any
    geometry, wasteful for *radius-bounded* queries. When the cloud is
    sharded into contiguous spatial slabs along ``slab_axis`` (sort by that
    coordinate before sharding), a radius query can only reach ``radius``
    past the slab edge, so each device needs just the boundary band of its
    two ring neighbors: per link, ``halo`` points instead of N — traffic
    proportional to the boundary area, exactly the boundary-voxel halo of
    a grid decomposition (here the slab edge band IS the boundary-cell
    set, selected as the ``halo`` points nearest each edge).

    Contract (documented + test-bounded, like ``neighbors.grid``):
      * ``radius`` must not exceed any slab's extent along ``slab_axis``
        (one-hop halos; a deeper reach would need multi-hop exchange);
      * ``halo`` must be ≥ the number of points within ``radius`` of a
        slab edge (undersized halos silently truncate, same contract as
        ``bucket_cap``); the ends of the slab line exchange nothing
        (non-periodic: the wrap-around halo is masked off).

    Args:
      xyz: float32[N, 3], slab-sorted, shardable on axis 0.
      mask: bool[N].
      radius / k_max: as ``neighbors.radius_neighbors``.
      halo: static boundary-band capacity per edge.

    Returns:
      (idx int32[N, k_max] — GLOBAL row indices, valid bool, dist_sq f32),
      sharded like ``xyz``; the k_max nearest in-radius points per query.
    """
    n_dev = mesh.shape[axis]
    N = xyz.shape[0]
    n_local = N // n_dev
    # a band can never hold more than the whole shard: top_k(k > lanes)
    # is a trace-time error, so clamp (small shards simply exchange
    # everything — the dense-oracle limit)
    halo = min(halo, n_local)
    r = jnp.float32(radius)

    def shard_fn(x, m):
        me = jax.lax.axis_index(axis)
        gidx = me * n_local + jnp.arange(n_local, dtype=jnp.int32)
        c = x[:, slab_axis]
        lo = jnp.min(jnp.where(m, c, jnp.inf))
        hi = jnp.max(jnp.where(m, c, -jnp.inf))
        # boundary bands: the `halo` points nearest each slab edge
        d_lo = jnp.where(m, c - lo, jnp.inf)   # height above my lower edge
        d_hi = jnp.where(m, hi - c, jnp.inf)   # depth below my upper edge
        _, sel_lo = jax.lax.top_k(-d_lo, halo)
        _, sel_hi = jax.lax.top_k(-d_hi, halo)
        band = lambda sel, d: (x[sel], m[sel] & (d[sel] <= r), gidx[sel])
        to_left = band(sel_lo, d_lo)    # my lower band → left neighbor
        to_right = band(sel_hi, d_hi)   # my upper band → right neighbor
        perm_r = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        perm_l = [(j, (j - 1 + n_dev) % n_dev) for j in range(n_dev)]
        from_left = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, perm_r), to_right)
        from_right = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, perm_l), to_left)
        # the slab line is NOT periodic: mask the wrap-around halos
        fl_x, fl_m, fl_i = from_left
        fr_x, fr_m, fr_i = from_right
        fl_m = fl_m & (me > 0)
        fr_m = fr_m & (me < n_dev - 1)

        src = jnp.concatenate([x, fl_x, fr_x])                 # [nl+2H, 3]
        src_m = jnp.concatenate([m, fl_m, fr_m])
        src_g = jnp.concatenate([gidx, fl_i, fr_i])
        s2 = jnp.sum(src * src, axis=-1)
        q2 = jnp.sum(x * x, axis=-1, keepdims=True)
        d = q2 + s2[None, :] - 2.0 * jnp.dot(
            x, src.T, precision=jax.lax.Precision.HIGHEST)
        d = jnp.maximum(d, 0.0)
        # source-mask only, matching neighbors.radius_neighbors (callers
        # mask invalid queries themselves)
        d = jnp.where(src_m[None, :], d, INF)
        neg, arg = jax.lax.top_k(-d, k_max)
        dist_sq = -neg
        idx = src_g[arg]
        valid = dist_sq <= r * r
        return idx, valid, dist_sq

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return fn(xyz, mask)


def sharded_match_votes(
    scene_desc: jnp.ndarray,
    bank_desc: jnp.ndarray,
    bank_valid: jnp.ndarray,
    threshold: float,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Bank-sharded correspondence counting with an explicit ``psum`` merge.

    The Ulysses-style bank split described in SURVEY.md §5: each device
    holds a shard of the [V, Mk, D] descriptor bank, matches the (replicated)
    scene descriptors against its shard locally on the MXU, and the per-view
    vote counts [V] are reassembled with one all-gather — here expressed as
    a shard_map so the collective is visible. Returns int32[V] counts of
    scene keypoints whose 1-NN in that view passes the squared-distance gate
    (reference's per-view match loop, ``SHOT.cpp:403-424``).
    """

    def shard_fn(sd, bd, bv):
        Vl, Mk, D = bd.shape
        flat = bd.reshape(Vl * Mk, D)
        s2 = jnp.sum(sd * sd, axis=-1, keepdims=True)
        b2 = jnp.sum(flat * flat, axis=-1)
        d = s2 + b2[None, :] - 2.0 * jnp.dot(
            sd, flat.T, precision=jax.lax.Precision.HIGHEST
        )
        d = jnp.maximum(d, 0.0).reshape(-1, Vl, Mk)
        d = jnp.where(bv[None, :, :], d, INF)
        d1 = jnp.min(d, axis=-1)  # [Ms, Vl]
        return jnp.sum((d1 < threshold).astype(jnp.int32), axis=0)  # [Vl]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(scene_desc, bank_desc, bank_valid)
