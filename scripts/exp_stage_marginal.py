"""Marginal (×2 − ×1) device-compute breakdown of the fused detect chain.

Each stage variant is jitted to return a scalar that depends on the stage's
outputs; timing it called once vs twice (distinct inputs) inside a single
dispatch cancels the ~30 ms remote-attachment roundtrip, leaving pure
device compute. The deltas between successive variants are per-stage costs.
Engineering tool — run on the TPU.
"""
from __future__ import annotations

import dataclasses
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


def marginal(name, make_fn, jitters, n=10):
    f1 = jax.jit(lambda: make_fn(jitters[0]))
    f2 = jax.jit(lambda: make_fn(jitters[0]) + make_fn(jitters[1]))
    out = []
    for f in (f1, f2):
        jax.block_until_ready(f())
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            ts.append((time.perf_counter() - t0) * 1000)
        out.append(float(np.median(ts)))
    print(f"{name:46s} marginal {out[1] - out[0]:7.2f} ms "
          f"(x1 {out[0]:.1f}, x2 {out[1]:.1f})", flush=True)
    return out[1] - out[0]


def main():
    from tpu_joints.pipelines.detect import (
        detect_with_features, prepare_scene, _strip_crop)
    from tpu_joints.pipelines.ingest import (
        ingest_organized_blocks, ingest_organized_segmented)

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    hw = 5

    jitters = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(2)]

    def ingest_only(j):
        scene, normals, curv, n_sel = ingest_organized_blocks(
            xyz_img + j, valid, block=block, half_window=hw,
            capacity=det_cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return scene.xyz.sum() + normals.sum() + curv.sum()

    def ingest_seg(j):
        scene, normals, curv, n_sel = ingest_organized_segmented(
            xyz_img + j, valid, cfg, block=block, half_window=hw,
            crop_lo=crop_lo, crop_hi=crop_hi)
        return scene.xyz.sum() + normals.sum() + curv.sum()

    def feats_of(j):
        scene, normals, curv, _ = ingest_organized_blocks(
            xyz_img + j, valid, block=block, half_window=hw,
            capacity=det_cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return prepare_scene(scene, _strip_crop(det_cfg), None, normals, curv)

    def thru_prepare(j):
        f = feats_of(j)
        return f.desc.sum() + f.keys.xyz.sum() + f.rf.sum()

    def thru_pose_only(j):
        res = detect_with_features(feats_of(j), bank, _strip_crop(det_cfg))
        return res.full_pose.sum()   # XLA DCEs OBB/metrics not feeding this

    def thru_full(j):
        res = detect_with_features(feats_of(j), bank, _strip_crop(det_cfg))
        leaves = jax.tree_util.tree_leaves(res)
        return sum(l.sum().astype(jnp.float32) for l in leaves
                   if l.dtype != jnp.bool_) + res.full_pose.sum()

    m_ing = marginal("ingest (plain)", ingest_only, jitters)
    m_seg = marginal("ingest (segmented lattice)", ingest_seg, jitters)
    m_prep = marginal("ingest + prepare (keys/SHOT/LRF)", thru_prepare, jitters)
    m_pose = marginal("full chain -> pose only (DCE extras)", thru_pose_only,
                      jitters)
    m_full = marginal("full chain -> every result leaf", thru_full, jitters)
    print()
    print(f"stage costs: ingest {m_ing:.1f} | lattice-seg extra "
          f"{m_seg - m_ing:.1f} | prepare {m_prep - m_ing:.1f} | "
          f"match+refine {m_pose - m_prep:.1f} | "
          f"obb/metrics tail {m_full - m_pose:.1f}")


if __name__ == "__main__":
    main()
