"""Microbenchmark: top-k strategies for the kNN merge on TPU."""
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


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:44s} {np.median(ts):9.3f} ms", flush=True)


def main():
    M = 32768
    rng = np.random.default_rng(0)
    for C in (2048, 8192):
        d = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
        print(f"--- block [{M}, {C}]", flush=True)
        timeit("top_k k=16", jax.jit(lambda d: jax.lax.top_k(d, 16)), d)
        timeit("approx_min_k k=16 r=0.95",
               jax.jit(lambda d: jax.lax.approx_min_k(d, 16)), d)
        timeit("approx_min_k k=16 r=0.99",
               jax.jit(lambda d: jax.lax.approx_min_k(d, 16, recall_target=0.99)), d)
        timeit("argmin (k=1 via min+argmin)",
               jax.jit(lambda d: (jnp.min(d, -1), jnp.argmin(d, -1))), d)
        timeit("sort full",
               jax.jit(lambda d: jnp.sort(d, -1)[:, :16]), d)

    # the actual pattern: full knn 32768->32768 k=16, restructured
    q = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))

    def knn_restructured(q, chunk):
        n_chunks = M // chunk
        src = q.reshape(n_chunks, chunk, 3)
        q2 = jnp.sum(q * q, -1, keepdims=True)

        def step(carry, inp):
            best_d, best_i = carry
            c_idx, s_c = inp
            s2 = jnp.sum(s_c * s_c, -1)
            dd = q2 + s2[None, :] - 2 * jnp.dot(q, s_c.T,
                                                precision=jax.lax.Precision.HIGHEST)
            vals, idx = jax.lax.approx_min_k(dd, 16)
            idx = idx + c_idx * chunk
            cat_d = jnp.concatenate([best_d, vals], 1)
            cat_i = jnp.concatenate([best_i, idx], 1)
            neg, arg = jax.lax.top_k(-cat_d, 16)
            return (-neg, jnp.take_along_axis(cat_i, arg, 1)), None

        init = (jnp.full((M, 16), 3e38), jnp.zeros((M, 16), jnp.int32))
        (bd, bi), _ = jax.lax.scan(step, init, (jnp.arange(n_chunks), src))
        return bd, bi

    for chunk in (2048, 8192):
        timeit(f"knn restructured approx chunk={chunk}",
               jax.jit(lambda q, c=chunk: knn_restructured(q, c)), q)

    def knn_k1(q, chunk):
        n_chunks = M // chunk
        src = q.reshape(n_chunks, chunk, 3)
        q2 = jnp.sum(q * q, -1, keepdims=True)

        def step(carry, inp):
            best_d, best_i = carry
            c_idx, s_c = inp
            s2 = jnp.sum(s_c * s_c, -1)
            dd = q2 + s2[None, :] - 2 * jnp.dot(q, s_c.T,
                                                precision=jax.lax.Precision.HIGHEST)
            bd = jnp.min(dd, -1)
            bi = jnp.argmin(dd, -1) + c_idx * chunk
            take = bd < best_d
            return (jnp.where(take, bd, best_d), jnp.where(take, bi, best_i)), None

        init = (jnp.full((M,), 3e38), jnp.zeros((M,), jnp.int32))
        (bd, bi), _ = jax.lax.scan(step, init, (jnp.arange(n_chunks), src))
        return bd, bi

    for chunk in (2048, 8192):
        timeit(f"knn k=1 argmin-merge chunk={chunk}",
               jax.jit(lambda q, c=chunk: knn_k1(q, c)), q)


if __name__ == "__main__":
    main()
