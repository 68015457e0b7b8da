"""Region growing on the organized sensor lattice (SURVEY.md A10 fast path).

The generic ``region_growing`` reproduces PCL's BFS over an explicit kNN
graph (reference ``SHOT_demo.cpp:302-314``); building that graph is an
O(N²) distance problem and the single most expensive op on the segmented
pipeline (~32 ms net for an 8k working set on v5e). But the pipeline's
scenes come from an *organized* 640×480 frame — and on a sensor scan the
neighbor structure is already encoded in the pixel lattice: points adjacent
on the surface are adjacent in image space, and depth discontinuities
(where image adjacency lies about 3-D adjacency) are exactly the edges a
``max_edge`` cap severs anyway.

So the lattice formulation needs no neighbor search at all: the growth
relation is evaluated once per 8-neighborhood direction as shifted-plane
compares (VPU stencils), and connected components come from iterated
min-label propagation with pointer-jumping compression — O(log diameter)
sweeps of a few [H, W]-plane ops plus one flat gather. Semantics match the
generic path: a directed edge i→j exists when i may seed (curvature(i) <
threshold), the normals agree within the smoothness angle, and the 3-D
edge is shorter than ``max_edge`` (PCL's implicit sensor-density bound made
explicit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_joints.segment.region_growing import Clusters

# 8-neighborhood offsets (row, col)
_DIRS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _shift2d(a: jnp.ndarray, dr: int, dc: int, fill) -> jnp.ndarray:
    """``a`` shifted so that out[r, c] = a[r + dr, c + dc] (edge → fill)."""
    out = jnp.roll(a, (-dr, -dc), axis=(0, 1))
    if dr == 1:
        out = out.at[-1].set(fill)
    elif dr == -1:
        out = out.at[0].set(fill)
    if dc == 1:
        out = out.at[:, -1].set(fill)
    elif dc == -1:
        out = out.at[:, 0].set(fill)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("smoothness_deg", "curvature_threshold",
                     "min_cluster_size", "max_sweeps", "max_edge"),
)
def region_growing_lattice(
    xyz: jnp.ndarray,
    normals: jnp.ndarray,
    curvature: jnp.ndarray,
    valid: jnp.ndarray,
    smoothness_deg: float = 7.0,
    curvature_threshold: float = 7.0,
    min_cluster_size: int = 50,
    max_sweeps: int = 64,
    max_edge: float = 3.0e38,
) -> Clusters:
    """Connected smooth regions over an organized [H, W] node lattice.

    Args:
      xyz/normals: float32[H, W, 3]; curvature/valid: [H, W].
      Other parameters as in :func:`region_growing`.

    Returns Clusters over the FLAT [H·W] layout (labels are flat lattice
    indices; -1 for invalid/undersized, matching the generic path).
    """
    H, W = curvature.shape
    N = H * W
    cos_thresh = jnp.cos(jnp.radians(jnp.float32(smoothness_deg)))
    edge_cap_sq = min(float(max_edge) ** 2, 1e30)

    # per-direction growth gates, evaluated once as shifted-plane compares
    gates = []
    for dr, dc in _DIRS:
        nb_xyz = _shift2d(xyz, dr, dc, jnp.float32(3e38))
        nb_nrm = _shift2d(normals, dr, dc, jnp.float32(0))
        nb_cur = _shift2d(curvature, dr, dc, jnp.float32(3e38))
        nb_ok = _shift2d(valid, dr, dc, False)
        d2 = jnp.sum((nb_xyz - xyz) ** 2, axis=-1)
        cos = jnp.abs(jnp.sum(nb_nrm * normals, axis=-1))
        gates.append(valid & nb_ok
                     & (d2 < jnp.float32(edge_cap_sq))
                     & (cos >= cos_thresh)
                     & (nb_cur < curvature_threshold))
    edge_in = jnp.stack(gates)  # [8, H, W]: neighbor d → node

    flat_idx = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    init = jnp.where(valid, flat_idx, jnp.int32(N))

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        labels, _, it = state
        new = labels
        for d, (dr, dc) in enumerate(_DIRS):
            nb = _shift2d(labels, dr, dc, jnp.int32(N))
            new = jnp.minimum(new, jnp.where(edge_in[d], nb, jnp.int32(N)))
        # pointer jumping (Shiloach–Vishkin shortcut) on the flat layout:
        # labels are lattice indices, so chasing new[new] splices directed
        # paths and turns O(diameter) sweeps into O(log diameter)
        f = new.reshape(N)
        for _ in range(2):
            f = jnp.minimum(f, f[jnp.minimum(f, N - 1)])
        new = jnp.where(valid, f.reshape(H, W), jnp.int32(N))
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))

    flat = labels.reshape(N)
    vflat = valid.reshape(N)
    ones = vflat.astype(jnp.int32)
    sizes = jax.ops.segment_sum(ones, jnp.minimum(flat, N - 1), num_segments=N)
    big = sizes[jnp.clip(flat, 0, N - 1)] >= min_cluster_size
    flat = jnp.where(vflat & big, flat, -1)
    return Clusters(labels=flat, sizes=sizes)
