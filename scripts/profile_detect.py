"""Per-stage latency breakdown of the detection pipeline on the current
device (run on the TPU to find the hot stage; persistent compile cache keeps
reruns cheap). Not part of the public API — an engineering tool.
"""
from __future__ import annotations

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


def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # true sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:34s} {np.median(ts):10.2f} ms", flush=True)
    return out


def main():
    from tpu_joints.features.normals import estimate_normals
    from tpu_joints.features.shot import compute_shot
    from tpu_joints.filters import compact_cloud, uniform_sample_mask
    from tpu_joints.neighbors import knn
    from tpu_joints.pipelines.detect import (
        _group_all_views,
        detect,
        match_bank,
        prepare_scene,
    )
    from tpu_joints.recognize.icp import icp, icp_multi

    scene, bank, cfg = bench.build_problem()
    print(f"device={jax.devices()[0].device_kind} scene_cap={scene.capacity} "
          f"views={bank.n_views} keys={bank.key_xyz.shape[1]}")

    timeit("detect (full)", lambda: detect(scene, bank, cfg))

    normals, curv = timeit(
        "normals k=%d" % cfg.normal_k,
        lambda: estimate_normals(scene, k=cfg.normal_k),
    )
    timeit("raw knn scene->scene k=16",
           lambda: knn(scene.xyz, scene.xyz, 16, source_mask=scene.mask))
    timeit("raw knn k=1 (icp inner)",
           lambda: knn(scene.xyz, scene.xyz, 1, source_mask=scene.mask))

    keep = timeit("uniform_sample", lambda: uniform_sample_mask(scene, cfg.scene_ss))
    keys, kidx = compact_cloud(scene, keep, cfg.scene_key_capacity)
    timeit("compute_shot",
           lambda: compute_shot(keys, scene, normals, radius=cfg.descr_rad,
                                k_max=cfg.k_max))

    feats = timeit("prepare_scene (all)", lambda: prepare_scene(scene, cfg))
    corrs = timeit(
        "match_bank",
        lambda: match_bank(feats.desc, feats.desc_valid, bank.desc,
                           bank.key_valid, cfg),
    )
    inst = timeit("group_all_views (hough)",
                  lambda: _group_all_views(feats, bank, corrs, cfg))

    from tpu_joints.core.cloud import Cloud

    src = Cloud(xyz=bank.view_xyz[0], mask=bank.view_mask[0],
                rgb=jnp.zeros_like(bank.view_xyz[0]))
    T0 = jnp.eye(4)
    timeit(f"icp x1 ({cfg.icp_iterations} iters)",
           lambda: icp(src, scene, T0, iterations=cfg.icp_iterations,
                       max_corr_dist=cfg.icp_max_corr_dist, chunk=1024))
    views4 = jnp.asarray([0, 1, 2, 3], jnp.int32)
    T4 = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))
    timeit(f"icp_multi x4 ({cfg.icp_iterations} iters)",
           lambda: icp_multi(bank.view_xyz[views4], bank.view_mask[views4],
                             scene, T4, iterations=cfg.icp_iterations,
                             max_corr_dist=cfg.icp_max_corr_dist, chunk=2048))


if __name__ == "__main__":
    main()
