"""Where does XLA's batched lowering lose 2x? (VERDICT r3 weak 6)

``detect_organized_batch`` (a plain vmap of the fused chain, B=8)
delivers ~31 fps vs ~51-61 fps streaming even though dispatch amortizes
over the batch — so the BATCHED device compute must be >2x the
single-frame device compute. This script localizes the loss: for each
stage of the fused chain it measures marginal (x2 - x1) device compute
of the single-frame program and of the vmapped B=8 program, and prints
the per-frame ratio. Engineering tool — run on the TPU.

Run:  python scripts/exp_batch_lowering.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

B = int(os.environ.get("BL_BATCH", "8"))


def med_ms(f, n=8):
    jax.block_until_ready(f())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def marginal(make_fn, jitters):
    f1 = jax.jit(lambda: make_fn(jitters[0]))
    f2 = jax.jit(lambda: make_fn(jitters[0]) + make_fn(jitters[1]))
    return max(med_ms(f2) - med_ms(f1), 0.0)


def main():
    from tpu_joints.pipelines.detect import (
        detect_with_features, prepare_scene, _strip_crop)
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    scfg = _strip_crop(det_cfg)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    hw = 5

    # single-frame jitters and batched jitter stacks (distinct per frame)
    j1 = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(2)]
    jB = [jnp.asarray(np.stack([
        np.random.default_rng(100 * s + i).normal(
            0, 1e-4, xyz_img_h.shape).astype(np.float32)
        for i in range(B)])) for s in range(2)]

    def ingest1(j):
        scene, normals, curv, _ = ingest_organized_blocks(
            xyz_img + j, valid, block=block, half_window=hw,
            capacity=det_cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return scene.xyz.sum() + normals.sum() + curv.sum()

    def feats1(j):
        scene, normals, curv, _ = ingest_organized_blocks(
            xyz_img + j, valid, block=block, half_window=hw,
            capacity=det_cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return prepare_scene(scene, scfg, None, normals, curv)

    def prepare1(j):
        f = feats1(j)
        return f.desc.sum() + f.keys.xyz.sum() + f.rf.sum()

    def full1(j):
        res = detect_with_features(feats1(j), bank, scfg)
        return res.full_pose.sum()

    def batched(stage1):
        def fn(jb):
            return jax.vmap(lambda j: stage1(j))(jb).sum()
        return fn

    stages = [("ingest", ingest1), ("thru prepare", prepare1),
              ("full chain", full1)]
    print(f"batch B={B}; marginal x2-x1 device compute, per-frame:")
    prev1 = prevB = 0.0
    for name, s1 in stages:
        m1 = marginal(s1, j1)
        mB = marginal(batched(s1), jB) / B
        d1, dB = m1 - prev1, mB - prevB
        print(f"{name:14s} single {m1:7.2f} ms  batched/frame {mB:7.2f} ms "
              f"ratio {mB / max(m1, 1e-9):5.2f}  "
              f"| stage delta single {d1:6.2f} batched {dB:6.2f} "
              f"ratio {dB / max(d1, 1e-9):5.2f}", flush=True)
        prev1, prevB = m1, mB


if __name__ == "__main__":
    main()
