"""Where does XLA's batched lowering lose 2x? (VERDICT r3 weak 6 / r4
item 5)

``detect_organized_batch`` (a plain vmap of the fused chain, B=8)
delivers ~31 fps vs ~59 fps streaming even though dispatch amortizes
over the batch — so the BATCHED device compute must be ~2x the
single-frame device compute. This script localizes the loss per stage
(ingest → prepare → full chain) by timing each sub-chain single-frame
and vmapped-B, both PIPELINED (K dispatches in flight, one sync) so the
~28 ms tunnel dispatch floor amortizes away and the per-frame number is
~device compute. The r4 attempt used the x2−x1 marginal-dispatch trick
instead; its doubled B=8 programs were large enough to kill the remote
compile tunnel, and pipelined amortization measures the same quantity.

Run on TPU:  python scripts/exp_batch_lowering.py
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
K = 10  # dispatches in flight per measurement


def pipelined_ms(fn, args_stream):
    """Median per-dispatch time with K calls in flight (dispatch floor
    amortized — the scene_throughput measurement shape)."""
    out = fn(args_stream[0])
    jax.block_until_ready(out)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(a) for a in args_stream]
        jax.block_until_ready(outs[-1])
        meds.append((time.perf_counter() - t0) * 1000.0 / len(args_stream))
    return float(np.median(meds))


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

    # distinct jitters per dispatch so no result is constant-folded/reused
    j1 = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(K)]
    jB = [jnp.asarray(np.stack([
        np.random.default_rng(100 * s + i).normal(
            0, 1e-4, xyz_img_h.shape).astype(np.float32)
        for i in range(B)])) for s in range(K)]

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

    stages = [("ingest", ingest1), ("thru prepare", prepare1),
              ("full chain", full1)]
    print(f"batch B={B}; pipelined amortized per-frame times:", flush=True)
    prev1 = prevB = 0.0
    for name, s1 in stages:
        f_1 = jax.jit(s1)
        f_B = jax.jit(lambda jb, s1=s1: jax.vmap(s1)(jb).sum())
        m1 = pipelined_ms(f_1, j1)
        mB = pipelined_ms(f_B, jB) / B
        d1, dB = m1 - prev1, mB - prevB
        print(f"{name:14s} single {m1:7.2f} ms/f  batched/frame {mB:7.2f} ms "
              f"ratio {mB / max(m1, 1e-9):5.2f}  "
              f"| stage delta single {d1:6.2f} batched {dB:6.2f} "
              f"ratio {dB / max(d1, 1e-9):5.2f}", flush=True)
        prev1, prevB = m1, mB


if __name__ == "__main__":
    main()
