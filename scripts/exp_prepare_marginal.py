"""Marginal device-compute breakdown INSIDE the prepare and refine stages.

Same ×2−×1 single-dispatch technique as exp_stage_marginal.py, but cutting
at sub-stage boundaries: keypoint selection, SHOT support gather, SHOT
LRF+histogram, BOARD frames, match, grouping, tier-1 ICP, tier-2 polish.
Engineering tool — run on the TPU.
"""
from __future__ import annotations

import dataclasses
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
    print(f"{name:46s} marginal {out[1] - out[0]:7.2f} ms", flush=True)
    return out[1] - out[0]


def main():
    from tpu_joints.features.lrf import board_lrf
    from tpu_joints.features.shot import compute_shot, shot_lrf, shot_histograms
    from tpu_joints.filters import compact_cloud, uniform_sample_mask
    from tpu_joints.neighbors.bruteforce import radius_neighbors
    from tpu_joints.pipelines.detect import _strip_crop
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

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

    def base(j):
        scene, normals, curv, _ = ingest_organized_blocks(
            xyz_img + j, valid, block=block, half_window=hw,
            capacity=det_cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return scene, normals

    def s_keys(j):
        scene, normals = base(j)
        keep = uniform_sample_mask(scene, det_cfg.scene_ss)
        keys, kidx = compact_cloud(scene, keep, det_cfg.scene_key_capacity)
        return keys, kidx, scene, normals

    def m_keys(j):
        keys, kidx, scene, normals = s_keys(j)
        return keys.xyz.sum() + kidx.sum().astype(jnp.float32)

    def m_gather(j):
        keys, kidx, scene, normals = s_keys(j)
        idx, within, d2 = radius_neighbors(
            keys.xyz, scene.xyz, det_cfg.descr_rad, det_cfg.k_max,
            source_mask=scene.mask)
        return (scene.xyz[idx].sum() + within.sum().astype(jnp.float32)
                + normals[idx].sum())

    def m_shotlrf(j):
        keys, kidx, scene, normals = s_keys(j)
        idx, within, d2 = radius_neighbors(
            keys.xyz, scene.xyz, det_cfg.descr_rad, det_cfg.k_max,
            source_mask=scene.mask)
        nv = within & keys.mask[:, None]
        rf, ok = shot_lrf(keys.xyz, scene.xyz[idx], nv, det_cfg.descr_rad)
        return rf.sum() + ok.sum().astype(jnp.float32)

    def m_shot(j):
        keys, kidx, scene, normals = s_keys(j)
        desc, rf, ok = compute_shot(keys, scene, normals,
                                    radius=det_cfg.descr_rad,
                                    k_max=det_cfg.k_max)
        return desc.sum() + rf.sum()

    def m_board(j):
        keys, kidx, scene, normals = s_keys(j)
        nidx, nwithin, _ = radius_neighbors(
            keys.xyz, scene.xyz, det_cfg.rf_rad, det_cfg.rf_k_max,
            source_mask=scene.mask)
        nvalid = nwithin & keys.mask[:, None]
        rf, rf_ok = board_lrf(keys.xyz, normals[kidx], scene.xyz[nidx],
                              normals[nidx], nvalid, det_cfg.rf_rad)
        return rf.sum() + rf_ok.sum().astype(jnp.float32)

    m0 = marginal("keys (uniform sample + compact)", m_keys, jitters)
    m1 = marginal("+ SHOT support radius gather (k=96)", m_gather, jitters)
    m2 = marginal("+ shot_lrf", m_shotlrf, jitters)
    m3 = marginal("+ shot histograms (full compute_shot)", m_shot, jitters)
    m4 = marginal("keys + BOARD gather (k=256) + board_lrf", m_board, jitters)
    print()
    print(f"keys {m0:.1f} | shot-gather {m1 - m0:.1f} | "
          f"shot-lrf {m2 - m1:.1f} | shot-hist {m3 - m2:.1f} | "
          f"board(total) {m4 - m0:.1f}")


if __name__ == "__main__":
    main()
