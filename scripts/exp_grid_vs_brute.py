"""TPU measurement: voxel-grid vs brute-force NN at pipeline shapes, and
the pointer-jumping region-growing rewrite (VERDICT round-3 items 1-3).

Times, at the segmented bench's working shapes (scene 8192, keys 1024):
  - region_growing (compressed propagation) end to end
  - the k=16 graph kNN alone: brute vs grid
  - the SHOT support gather (keys->scene radius 0.06 k_max=96): brute vs grid
  - the rf gather (k_max=256): brute vs grid
Numbers go into docs/PERFORMANCE.md; whichever path wins gets wired.
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

import bench


def timeit(name, fn, n=10):
    out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:44s} {np.median(ts):10.2f} ms", flush=True)
    return out


def main():
    import dataclasses

    from tpu_joints.neighbors import knn, radius_neighbors
    from tpu_joints.neighbors.grid import (
        build_grid, grid_radius_neighbors, max_cell_occupancy)
    from tpu_joints.pipelines.ingest import ingest_organized_blocks
    from tpu_joints.segment import region_growing

    # the GENERIC (unorganized) path's scale: the organized pipeline no
    # longer builds kNN graphs at all (lattice segmentation), but the
    # generic presets still pay O(N²) at capacity 8192 — that is the
    # operating point the grid must beat
    CAP = int(os.environ.get("EXP_CAP", "8192"))
    cfg = dataclasses.replace(bench._make_config(), scene_capacity=CAP,
                              scene_key_capacity=1024)
    T_pose = bench._bench_pose()
    xyz_img_h, valid_h = bench._frame(T_pose, 42, with_table=True)
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    # block=2 so the working set actually fills the 8192 capacity
    scene, normals, curvature, n_sel = ingest_organized_blocks(
        xyz_img, valid, block=2, half_window=5,
        capacity=cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
    print(f"device={jax.devices()[0].device_kind} working_set={int(n_sel)} "
          f"capacity={cfg.scene_capacity}")

    # representative keypoints: stride subsample
    kidx = jnp.linspace(0, cfg.scene_capacity - 1,
                        cfg.scene_key_capacity).astype(jnp.int32)
    keys_xyz = scene.xyz[kidx]

    # --- region growing (now with pointer jumping) -----------------------
    rg = jax.jit(functools.partial(
        region_growing, k=min(30, cfg.normal_k),
        smoothness_deg=cfg.rg_smoothness_deg,
        curvature_threshold=cfg.rg_curvature,
        min_cluster_size=cfg.rg_min_cluster, max_edge=cfg.rg_max_edge))
    timeit("region_growing (compressed)", lambda: rg(scene, normals, curvature))

    # --- graph kNN: brute vs grid ----------------------------------------
    k = min(30, cfg.normal_k)
    kb = jax.jit(functools.partial(knn, k=k, allow_pallas=False))
    timeit(f"graph kNN brute k={k}", lambda: kb(
        scene.xyz, scene.xyz, source_mask=scene.mask))

    for cell, cap in ((cfg.rg_max_edge, 160), (cfg.rg_max_edge, 96)):
        bg = jax.jit(functools.partial(build_grid, cell_size=float(cell),
                                       table_size=4 * cfg.scene_capacity))
        grid = bg(scene.xyz, scene.mask)
        occ = int(max_cell_occupancy(grid))
        gq = jax.jit(functools.partial(
            grid_radius_neighbors, radius=float(cell), k_max=k,
            bucket_cap=cap, query_chunk=2048))
        timeit(f"graph grid cell={float(cell):.2f} cap={cap} (occ={occ})",
               lambda: gq(bg(scene.xyz, scene.mask), scene.xyz))

    # --- SHOT support gather: brute vs grid -------------------------------
    sb = jax.jit(functools.partial(
        radius_neighbors, radius=cfg.descr_rad, k_max=cfg.k_max))
    timeit(f"SHOT gather brute k_max={cfg.k_max}", lambda: sb(
        keys_xyz, scene.xyz, source_mask=scene.mask))
    bgs = jax.jit(functools.partial(build_grid, cell_size=cfg.descr_rad,
                                    table_size=4 * cfg.scene_capacity))
    grid_s = bgs(scene.xyz, scene.mask)
    occ_s = int(max_cell_occupancy(grid_s))
    for cap in (160, 224):
        gqs = jax.jit(functools.partial(
            grid_radius_neighbors, radius=cfg.descr_rad, k_max=cfg.k_max,
            bucket_cap=cap, query_chunk=512))
        timeit(f"SHOT gather grid cap={cap} (occ={occ_s})",
               lambda: gqs(bgs(scene.xyz, scene.mask), keys_xyz))

    # --- rf gather (k_max=256): brute vs grid ----------------------------
    rb = jax.jit(functools.partial(
        radius_neighbors, radius=cfg.rf_rad, k_max=cfg.rf_k_max))
    timeit(f"rf gather brute k_max={cfg.rf_k_max}", lambda: rb(
        keys_xyz, scene.xyz, source_mask=scene.mask))
    gqr = jax.jit(functools.partial(
        grid_radius_neighbors, radius=cfg.rf_rad, k_max=cfg.rf_k_max,
        bucket_cap=160, query_chunk=512))
    timeit("rf gather grid cap=160", lambda: gqr(
        bgs(scene.xyz, scene.mask), keys_xyz))


if __name__ == "__main__":
    main()
