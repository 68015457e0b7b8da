"""Fused kNN Pallas kernel — distance matmul + streaming top-k in VMEM.

The XLA formulation of the tiled NN search (``bruteforce.knn``) materializes
each [M, chunk] distance block to HBM and runs separate min/argmin/top-k
passes over it; at the pipeline's sizes that costs ~10× the memory-bandwidth
floor. This kernel keeps each distance tile resident in VMEM and fuses:

    d = ||q||² + ||s||² − 2 q·sᵀ   (MXU, coords packed on the sublane axis)
    running top-k merge             (VPU, per-tile, no HBM round trips)

Source-mask handling is folded into ``||s||²`` (masked lanes carry +INF, so
their distances are INF before any comparison). k=1 is a single
min/argmin pass; k>1 uses k rounds of extract-and-replace against an
unsorted best-list in VMEM scratch — O(k·TN) VPU work per tile, no sort.

Grid: (M/TM, N/TN), source axis innermost; the best-list scratch persists
across the source sweep and is flushed to HBM on the last source tile.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # plain float: jnp constants would be captured tracers in the kernel
INF = jnp.float32(_INF)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _knn_kernel(qt_ref, st_ref, s2_ref, outd_ref, outi_ref, bd, bi, *,
                k: int, tm: int, tn: int, n_j: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        bd[:] = jnp.full((tm, k), _INF, jnp.float32)
        bi[:] = jnp.zeros((tm, k), jnp.int32)

    q = qt_ref[:]  # [TM, 8] (cols 0..2 = xyz, rest zero) — column slices of
    #                 the query tile broadcast along lanes with NO transpose
    s = st_ref[:]  # [8, TN] — row slices broadcast along sublanes likewise
    pen = s2_ref[:]  # [1, TN]; 0 on valid lanes, +INF on masked/padded ones
    # Direct VPU difference form — exact f32 and ~9 ops/element. The matmul
    # expansion is a trap here: K=3 pads to the MXU's 128-wide contraction
    # (≈6% utilization) and needs 6-pass f32, measured ~15× slower.
    dx = q[:, 0:1] - s[0:1, :]
    dy = q[:, 1:2] - s[1:2, :]
    dz = q[:, 2:3] - s[2:3, :]
    d = dx * dx + dy * dy + dz * dz + pen
    base = j * tn

    if k == 1:
        a = jnp.argmin(d, axis=1).astype(jnp.int32)
        v = jnp.min(d, axis=1)
        take = v < bd[:, 0]
        bd[:, 0] = jnp.where(take, v, bd[:, 0])
        bi[:, 0] = jnp.where(take, a + base, bi[:, 0])
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        kl = jax.lax.broadcasted_iota(jnp.int32, (tm, k), 1)
        cur_d = bd[:]
        cur_i = bi[:]
        for _ in range(k):
            a = jnp.argmin(d, axis=1)
            v = jnp.min(d, axis=1)
            worst = jnp.max(cur_d, axis=1)
            wa = jnp.argmax(cur_d, axis=1)
            take = v < worst
            repl = (kl == wa[:, None]) & take[:, None]
            cur_d = jnp.where(repl, v[:, None], cur_d)
            cur_i = jnp.where(repl, (a.astype(jnp.int32) + base)[:, None], cur_i)
            d = jnp.where(lane == a[:, None], _INF, d)
        bd[:] = cur_d
        bi[:] = cur_i

    @pl.when(j == n_j - 1)
    def _():
        outd_ref[:] = bd[:]
        outi_ref[:] = bi[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tm", "tn", "interpret")
)
def knn_pallas(
    query: jnp.ndarray,
    source: jnp.ndarray,
    k: int,
    source_mask: Optional[jnp.ndarray] = None,
    tm: int = 256,
    tn: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN over 3-D points. Same contract as ``bruteforce.knn``
    (without ``exclude_self``): returns (dist_sq [M, k], idx [M, k]);
    rows with no valid source keep dist_sq == INF."""
    M, D = query.shape
    N = source.shape[0]
    assert D == 3, "knn_pallas packs xyz on the sublane axis"
    if source_mask is None:
        source_mask = jnp.ones((N,), bool)

    Mp, Np = _round_up(M, tm), _round_up(N, tn)
    qt = jnp.zeros((Mp, 8), jnp.float32).at[:M, :3].set(query)
    st = jnp.zeros((8, Np), jnp.float32).at[:3, :N].set(source.T)
    # additive penalty row: 0 for valid source lanes, +INF for masked/padded
    s2 = jnp.where(source_mask, 0.0, INF)
    s2 = jnp.full((1, Np), INF, jnp.float32).at[0, :N].set(s2)

    n_i, n_j = Mp // tm, Np // tn

    # Unique kernel_name per instantiation (a real def, not a partial — the
    # name must survive into the custom call's kernel_name attribute): the
    # TPU runtime deterministically faulted (INVALID_ARGUMENT) re-executing
    # a Mosaic program after a *different* program whose custom call carried
    # the SAME kernel_name had run — payload bytes differ per
    # (shape, k, tile) but the name "_knn_kernel" collided (round-1 A,B,A
    # fault; see docs/PERFORMANCE.md and tests/test_pallas_stress.py).
    def kernel(*refs):
        return _knn_kernel(*refs, k=k, tm=tm, tn=tn, n_j=n_j)

    kernel.__name__ = f"_knn_kernel_m{Mp}_n{Np}_k{k}_tm{tm}_tn{tn}"
    outd, outi = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((tm, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, k), jnp.float32),
            jax.ShapeDtypeStruct((Mp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, k), jnp.float32),
            pltpu.VMEM((tm, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * 8 + (k + 3) * Mp * Np,
            bytes_accessed=(8 * Mp + 9 * Np + 2 * Mp * k) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # query tiles are independent; only the source sweep carries state
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, st, s2)
    # clamp indices of all-masked rows into range (dist stays INF)
    outi = jnp.clip(outi, 0, max(N - 1, 0))
    return outd[:M], outi[:M]


def pallas_available() -> bool:
    """True when the current default backend can run the compiled kernel."""
    import os

    if os.environ.get("TPU_JOINTS_DISABLE_PALLAS") == "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
