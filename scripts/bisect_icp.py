"""Find the 67x blowup in vmapped candidate ICP. True-sync timing via
device_get of a computation-dependent scalar."""
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

import bench


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # true sync
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:40s} {np.median(ts):10.2f} ms", flush=True)


def main():
    from tpu_joints.core.cloud import Cloud
    from tpu_joints.core.transforms import transform_points, umeyama
    from tpu_joints.neighbors import knn
    from tpu_joints.recognize.icp import icp

    scene, bank, cfg = bench.build_problem()
    views = jnp.asarray([0, 1, 2, 3], jnp.int32)
    T0 = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))

    def icp_for(view, T):
        src = Cloud(xyz=bank.view_xyz[view], mask=bank.view_mask[view],
                    rgb=jnp.zeros_like(bank.view_xyz[view]))
        return icp(src, scene, T, iterations=cfg.icp_iterations,
                   max_corr_dist=cfg.icp_max_corr_dist, chunk=1024)

    timeit("single icp (true sync)", jax.jit(icp_for), views[0], T0[0])
    timeit("vmap icp x4", jax.jit(jax.vmap(icp_for)), views, T0)
    timeit("lax.map icp x4",
           jax.jit(lambda v, t: jax.lax.map(lambda a: icp_for(*a), (v, t))),
           views, T0)

    # vmapped icp but with the SVD update replaced by identity (isolates SVD)
    def icp_nosvd(view, T):
        src_xyz = bank.view_xyz[view]
        src_mask = bank.view_mask[view]

        def step(T, _):
            moved = transform_points(src_xyz, T)
            d, i = knn(moved, scene.xyz, 1, source_mask=scene.mask, chunk=1024)
            w = (src_mask & (d[:, 0] < 3e38)).astype(jnp.float32)
            # fake 'update' keeping data dependence but no SVD
            shift = jnp.sum((scene.xyz[i[:, 0]] - moved) * w[:, None], 0) / \
                jnp.maximum(jnp.sum(w), 1.0)
            delta = jnp.eye(4).at[:3, 3].set(shift)
            return delta @ T, None

        T, _ = jax.lax.scan(step, T, None, length=cfg.icp_iterations)
        return T

    timeit("vmap icp-NOSVD x4", jax.jit(jax.vmap(icp_nosvd)), views, T0)

    # vmapped umeyama alone (10 iters x 16384 pts)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(4, 16384, 3)).astype(np.float32))
    dst = src + 0.01
    w = jnp.ones((4, 16384), jnp.float32)

    def ume10(s, d, w):
        def step(c, _):
            T = umeyama(s + c * 1e-9, d, w)
            return c + T[0, 3], None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=10)
        return c

    timeit("umeyama x10 single", jax.jit(ume10), src[0], dst[0], w[0])
    timeit("umeyama x10 vmap x4", jax.jit(jax.vmap(ume10)), src, dst, w)

    # vmapped knn-only loop (isolates the NN inner loop under vmap)
    def nn10(view, T):
        src_xyz = bank.view_xyz[view]

        def step(c, _):
            d, i = knn(src_xyz + c * 1e-9, scene.xyz, 1,
                       source_mask=scene.mask, chunk=1024)
            return c + d[0, 0], None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=cfg.icp_iterations)
        return c

    timeit("nn-loop x10 single", jax.jit(nn10), views[0], T0[0])
    timeit("nn-loop x10 vmap x4", jax.jit(jax.vmap(nn10)), views, T0)


if __name__ == "__main__":
    main()
