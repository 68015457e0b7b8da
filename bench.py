"""Headline benchmark: full scene → 6D-pose pipeline latency on one chip.

The reference publishes no numbers (BASELINE.md); the north-star target is
< 50 ms/scene for the complete pipeline (normals → keypoints → SHOT-352 →
match against all 42 bank views → Hough grouping → ICP refine → pose) on a
single TPU v5e chip, at the reference's own problem scale: a Kinect-class
scene (~300k raw points downsampled to a 32k working set, crop_pcd.cpp:76-77)
against a 42-view model bank (render.cpp:33-35).

Prints ONE JSON line:
  {"metric": "scene_latency", "value": <ms>, "unit": "ms",
   "vs_baseline": <50/value>}   — vs_baseline > 1 beats the target.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

TARGET_MS = 50.0

# BENCH_SMALL=1 shrinks the problem for CI/CPU smoke-validation of the
# script itself; headline numbers come from the full-size TPU run.
SMALL = os.environ.get("BENCH_SMALL") == "1"


def build_problem():
    from tpu_joints.config import DetectionConfig
    from tpu_joints.core.cloud import make_cloud
    from tpu_joints.modelbank import build_bank, render_views

    cfg = DetectionConfig(
        descriptor="shot",
        descr_rad=0.12,
        model_ss=0.02,
        scene_ss=0.02,
        normal_k=16,
        normal_anchors=0 if SMALL else 8192,
        match_mode="nn",
        match_threshold=0.25,
        algorithm="hough",
        cg_size=0.05,
        cg_thresh=3.0,
        icp_iterations=10,
        max_candidates=4,
        max_instances_per_view=2,
        scene_capacity=2048 if SMALL else 32768,
        scene_key_capacity=256 if SMALL else 1024,
        k_max=32 if SMALL else 64,
    )

    # Synthetic pipe joint at the reference's physical scale (chord r=0.08 m,
    # stub r=0.05 m — see tests/util.joint_points and SURVEY.md §0).
    rng = np.random.default_rng(7)
    n_chord, n_stub = (3_000, 1_800) if SMALL else (40_000, 24_000)
    theta = rng.uniform(0, 2 * np.pi, n_chord)
    h = rng.uniform(-0.3, 0.3, n_chord)
    chord = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)], 1)
    theta2 = rng.uniform(0, 2 * np.pi, n_stub)
    h2 = rng.uniform(0.08, 0.35, n_stub)
    stub = np.stack([0.05 * np.cos(theta2), 0.05 * np.sin(theta2), h2], 1)
    model_xyz = np.concatenate([chord, stub]).astype(np.float32)

    bank = build_bank(
        model_xyz,
        descriptor=cfg.descriptor,
        descr_radius=cfg.descr_rad,
        sampling_radius=cfg.model_ss,
        normal_k=cfg.normal_k,
        k_max=cfg.k_max,
        level=0 if SMALL else 1,   # 42 views at level 1, render.cpp:33-35
        resolution=64 if SMALL else 128,
        key_capacity=64 if SMALL else 256,
    )
    views, poses, _ = render_views(
        model_xyz, level=0 if SMALL else 1, resolution=96 if SMALL else 256
    )
    v = int(np.argmax([w.shape[0] for w in views]))
    scene = make_cloud(views[v][: cfg.scene_capacity], capacity=cfg.scene_capacity)
    return scene, bank, cfg


def main():
    from tpu_joints.pipelines.detect import detect

    scene, bank, cfg = build_problem()

    res = detect(scene, bank, cfg)  # compile + warm
    jax.block_until_ready(res.full_pose)
    res = detect(scene, bank, cfg)
    jax.block_until_ready(res.full_pose)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        res = detect(scene, bank, cfg)
        jax.block_until_ready(res.full_pose)
        times.append((time.perf_counter() - t0) * 1000.0)
    ms = float(np.median(times))

    print(json.dumps({
        "metric": "scene_latency",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))
    print(
        f"# device={jax.devices()[0].device_kind} fitness={float(res.fitness):.2e} "
        f"accepted={bool(res.accepted)} min={min(times):.1f}ms max={max(times):.1f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
