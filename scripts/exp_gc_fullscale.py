"""Full-scale GeometricConsistency grouping run (VERDICT r4 item 8).

The reference's ``--algorithm GC`` path (``SHOT.cpp:471-483``,
``GeometricConsistencyGrouping``) has CPU-scale unit coverage
(tests/test_recognize.py, test_pipeline_variants.py) but had never run at
the bench's full 640×480 / 42-view shape on TPU, where its per-view
[M, M] pairwise-consistency matrix is the risk. This script runs the
DEFAULT bench frame through the same fused organized detect with
``algorithm="gc"`` vs ``"hough"`` and records latency + winner parity.
Results land in docs/PERFORMANCE.md.

Run (TPU):  python scripts/exp_gc_fullscale.py
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


def timed(fn, n=10):
    res, _ = fn()
    jax.block_until_ready(res.full_pose)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        res, _ = fn()
        jax.block_until_ready(res.full_pose)
        ts.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(ts)), res


def main():
    from tpu_joints.pipelines.detect import detect_organized

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    xyz_img, valid = jnp.asarray(xyz_img_h), jnp.asarray(valid_h)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    gc_cfg = dataclasses.replace(det_cfg, algorithm="gc")
    gc_tight = dataclasses.replace(gc_cfg, cg_size=0.02)

    def run(c):
        def f():
            return detect_organized(xyz_img, valid, bank, c, block=block,
                                    half_window=5, crop_lo=crop_lo,
                                    crop_hi=crop_hi, fused=True)
        return f

    for name, c in (("hough", det_cfg), ("gc", gc_cfg),
                    ("gc.02", gc_tight)):
        ms, res = timed(run(c))
        rot, trans = bench._err(np.asarray(res.full_pose), T_pose)
        print(f"{name:6s}: {ms:7.2f} ms  accepted={bool(res.accepted)} "
              f"view={int(res.view_idx)} "
              f"full_fitness={float(res.full_fitness):.3e} "
              f"rot={rot:.2f}deg trans={trans*1000:.1f}mm", flush=True)


if __name__ == "__main__":
    main()
