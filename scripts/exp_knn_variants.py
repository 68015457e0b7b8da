"""TPU microbench: why is [8192,8192] k=16 kNN ~30 ms? Try formulations.

A v5e does the 8192x8192x3 HIGHEST-precision distance matmul in well under
a millisecond; 30 ms means the select machinery (approx_min_k / top_k /
scan merge) dominates. Variants timed here decide the pipeline's kNN
formulation for round 3.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INF = jnp.float32(3.0e38)
HI = jax.lax.Precision.HIGHEST


def timeit(name, fn, n=10):
    out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:46s} {np.median(ts):10.2f} ms", flush=True)
    return out


def dist(q, s, prec=HI):
    q2 = jnp.sum(q * q, -1, keepdims=True)
    s2 = jnp.sum(s * s, -1)
    return jnp.maximum(q2 + s2[None, :] - 2.0 * jnp.dot(q, s.T, precision=prec), 0.0)


def main():
    from tpu_joints.neighbors import knn

    rng = np.random.default_rng(0)
    N = 8192
    theta = rng.uniform(0, 2 * np.pi, N)
    xyz = np.stack([rng.uniform(-0.3, 0.3, N), 0.08 * np.cos(theta),
                    0.08 * np.sin(theta)], 1).astype(np.float32)
    x = jnp.asarray(xyz)
    mask = jnp.ones((N,), bool)
    print(f"device={jax.devices()[0].device_kind}")

    # baseline: current knn (XLA path)
    for k in (16,):
        kb = jax.jit(functools.partial(knn, k=k, allow_pallas=False))
        timeit(f"knn current k={k} (chunk auto=8192)", lambda: kb(
            x, x, source_mask=mask))
        kb2 = jax.jit(functools.partial(knn, k=k, allow_pallas=False, chunk=2048))
        timeit(f"knn current k={k} chunk=2048", lambda: kb2(
            x, x, source_mask=mask))

        # single-shot dense: one [N,N] matmul + ONE approx_min_k
        @jax.jit
        def dense_approx(q, s):
            d = dist(q, s)
            return jax.lax.approx_min_k(d, k)
        timeit(f"dense matmul + approx_min_k k={k}", lambda: dense_approx(x, x))

        @jax.jit
        def dense_topk(q, s):
            d = dist(q, s)
            neg, i = jax.lax.top_k(-d, k)
            return -neg, i
        timeit(f"dense matmul + top_k k={k}", lambda: dense_topk(x, x))

        @jax.jit
        def dense_only(q, s):
            d = dist(q, s)
            return jnp.min(d, axis=1)
        timeit("dense matmul + row min (no select)", lambda: dense_only(x, x))

        @jax.jit
        def dense_bf16(q, s):
            d = dist(q, s, prec=jax.lax.Precision.DEFAULT)
            return jax.lax.approx_min_k(d, k)
        timeit(f"DEFAULT-prec matmul + approx_min_k k={k}",
               lambda: dense_bf16(x, x))

        # iterative-min extraction: k rounds of (row-min + mask) — k small
        @jax.jit
        def iter_min(q, s):
            d = dist(q, s)
            ds, is_ = [], []
            for _ in range(k):
                j = jnp.argmin(d, axis=1)
                dj = jnp.take_along_axis(d, j[:, None], 1)
                ds.append(dj)
                is_.append(j[:, None])
                d = jnp.where(jax.lax.broadcasted_iota(
                    jnp.int32, d.shape, 1) == j[:, None], INF, d)
            return jnp.concatenate(ds, 1), jnp.concatenate(is_, 1)
        timeit(f"dense + {k}x iterative argmin", lambda: iter_min(x, x))

    # pallas fused kernel (k<=32): in isolation
    from tpu_joints.neighbors.pallas_knn import knn_pallas, pallas_available
    if pallas_available():
        kp = jax.jit(functools.partial(knn_pallas, k=16, tn=2048))
        timeit("pallas fused k=16", lambda: kp(x, x, source_mask=mask))

    # the SHOT/rf gather shapes
    keys = x[:: N // 1024][:1024]
    for k in (96, 256):
        kb = jax.jit(functools.partial(knn, k=k, allow_pallas=False))
        timeit(f"keys knn current k={k}", lambda: kb(keys, x, source_mask=mask))

        @jax.jit
        def dense_topk_keys(q, s, k=k):
            d = dist(q, s)
            neg, i = jax.lax.top_k(-d, k)
            return -neg, i
        timeit(f"keys dense + top_k k={k}", lambda: dense_topk_keys(keys, x))

        @jax.jit
        def dense_approx_keys(q, s, k=k):
            d = dist(q, s)
            return jax.lax.approx_min_k(d, k)
        timeit(f"keys dense + approx_min_k k={k}",
               lambda: dense_approx_keys(keys, x))


if __name__ == "__main__":
    main()
