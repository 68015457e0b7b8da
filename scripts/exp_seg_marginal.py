"""Marginal device-compute breakdown INSIDE the lattice segmentation chain
(plane removal vs region-growing sweeps vs curvature filter).
Engineering tool — run on the TPU."""
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
    print(f"{name:52s} marginal {out[1] - out[0]:7.2f} ms", flush=True)
    return out[1] - out[0]


def main():
    from tpu_joints.pipelines.ingest import ingest_organized_segmented

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    seg_img_h, seg_valid_h = bench._frame(T_pose, 42, with_table=True)
    xyz_img = jnp.asarray(seg_img_h)
    valid = jnp.asarray(seg_valid_h)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    hw = 5

    jitters = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, seg_img_h.shape).astype(np.float32)) for i in range(2)]

    def run_with(c):
        def f(j):
            scene, normals, curv, n_sel = ingest_organized_segmented(
                xyz_img + j, valid, c, block=block, half_window=hw,
                crop_lo=crop_lo, crop_hi=crop_hi)
            return scene.xyz.sum() + normals.sum() + curv.sum()
        return f

    base_cfg = dataclasses.replace(cfg, remove_plane=False,
                                   segment_scene=False)
    plane_cfg = dataclasses.replace(cfg, segment_scene=False)
    full_cfg = cfg

    m0 = marginal("segmented ingest: crop only", run_with(base_cfg), jitters)
    m1 = marginal("+ sac plane removal", run_with(plane_cfg), jitters)
    m2 = marginal("+ region growing + curvature filter", run_with(full_cfg),
                  jitters)
    print(f"\nbase {m0:.1f} | plane {m1 - m0:.1f} | rg+filter {m2 - m1:.1f}")


if __name__ == "__main__":
    main()
