"""Microbenchmark: is vmapped 3x3 SVD the 13s cliff in candidate ICP?"""
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


def timeit(name, fn, *args, n=5):
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
    rng = np.random.default_rng(0)
    A1 = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    A4 = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))

    def svd10(A):
        def step(c, _):
            u, s, vt = jnp.linalg.svd(A + c * 1e-6)
            return c + s[0] * 0, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=10)
        return c

    timeit("svd 3x3 x10 (scan)", jax.jit(svd10), A1)
    timeit("svd 3x3 x10 vmapped x4", jax.jit(jax.vmap(svd10)), A4)

    def eigh10(A):
        S = A @ A.T

        def step(c, _):
            w, v = jnp.linalg.eigh(S + c * 1e-6)
            return c + w[0] * 0, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=10)
        return c

    timeit("eigh 3x3 x10 (scan)", jax.jit(eigh10), A1)
    timeit("eigh 3x3 x10 vmapped x4", jax.jit(jax.vmap(eigh10)), A4)

    def power10(A):
        """Horn-quaternion style: power iteration on a 4x4 symmetric."""
        S = jnp.eye(4) + jnp.pad(A @ A.T, ((0, 1), (0, 1)))

        def step(c, _):
            v = jnp.ones(4)
            for _ in range(16):
                v = S @ v
                v = v / jnp.linalg.norm(v)
            return c + v[0] * 0, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=10)
        return c

    timeit("power-iter 4x4 x10 (scan)", jax.jit(power10), A1)
    timeit("power-iter 4x4 x10 vmapped x4", jax.jit(jax.vmap(power10)), A4)


if __name__ == "__main__":
    main()
