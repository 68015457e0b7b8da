"""Headline benchmark: RAW sensor frame → 6D pose, one chip, end to end.

The reference's live path starts from a full 640×480 organized sensor cloud
(307,200 points — ``ROS_server.cpp:2138``, ``crop_pcd.cpp:76-77``) and runs
NaN filtering, normal estimation, downsampling, SHOT-352 against a 42-view
bank, Hough grouping, and ICP refinement (``SHOT.cpp:204-523``). This
benchmark measures that complete chain on one TPU chip:

  640×480 organized cloud (dense analytic raycast of the joint)
    → on-device ingest: integral-image normals + uniform downsample
      to a 32k working set                      (pipelines.ingest)
    → detect: keypoints → SHOT-352 → match all 42 views → Hough → batched
      ICP → composed pose                       (pipelines.detect)

The reference publishes no numbers (BASELINE.md); the north-star target is
< 50 ms/scene. Prints ONE JSON line:
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
# BENCH_SEGMENT=1 adds the reference's region-growing scene crop to the
# timed chain (SHOT_demo.cpp:282-400) and a workshop-table rectangle to the
# raycast scene, so the segmentation stage is timed at full sensor scale.
SEGMENT = os.environ.get("BENCH_SEGMENT") == "1"
# BENCH_THROUGHPUT=1 measures the pipelined serving rate instead of
# single-frame latency: frames are dispatched back-to-back without host
# syncs between them, so the ~30 ms control-channel roundtrip of this
# environment's remote TPU attachment amortizes away and the number
# approaches pure device compute (the steady-state of a streaming server).
THROUGHPUT = os.environ.get("BENCH_THROUGHPUT") == "1"


def _bench_pose() -> np.ndarray:
    """A fixed, well-conditioned pose: both chord and stub clearly visible."""
    ay, ax = np.radians(35.0), np.radians(-20.0)
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rx @ Ry
    T[:3, 3] = np.array([0.02, -0.03, 1.0], np.float32)
    return T


def build_problem():
    from tpu_joints.config import DetectionConfig
    from tpu_joints.modelbank import build_bank
    from tpu_joints.serve.depth import raycast_cylinders

    W, H = (320, 240) if SMALL else (640, 480)
    # one working-set point per BLOCK×BLOCK pixel tile (≈7 mm at 1 m for the
    # full frame; SMALL halves the image so BLOCK halves too, keeping the
    # working-set density — and hence SHOT support occupancy — identical)
    BLOCK = 2 if SMALL else 4
    cfg = DetectionConfig(
        descriptor="shot",
        descr_rad=0.06,
        model_ss=0.02,
        scene_ss=0.02,
        normal_k=16,
        match_mode="nn",
        match_threshold=0.25,
        algorithm="hough",
        # BOARD frames for Hough voting (the reference's own choice,
        # SHOT.cpp:441-453): the SHOT LRF's in-plane axis is degenerate on
        # smooth cylinder bodies and collapses under sensor noise, while
        # BOARD's normal-variation x-axis stays repeatable — measured the
        # difference as detect-vs-flip at 0.5 mm depth noise
        rf_frames="board",
        rf_rad=0.06,
        cg_size=0.05,
        cg_thresh=3.0,
        icp_iterations=6,
        icp_point_to_plane=True,
        icp_max_corr_dist=0.02,
        icp_max_corr_start=0.2,
        # SHOT_demo's full-CAD polish + score2<0.006 gate; SMALL's
        # 1024-row polish needs the extra iterations for sub-degree poses
        final_icp_iterations=8 if SMALL else 6,
                                  # (point-to-plane: ≈ 0.0°/0.4 mm)
        # 16 ranked candidates: under sensor noise the true pose can sit
        # deep in the Hough peak list (measured rank ~10 at 0.5 mm noise);
        # the full-CAD ranking picks it out of the wider field for a few
        # ms of extra folded-row ICP work
        max_candidates=16,
        # one peak per view: a spam view otherwise floods the ranked
        # pool with two high-vote flips, pushing the true pose out
        max_instances_per_view=1,
        # 2560 lanes: the 640x480/BLOCK=4 working set is ~2420 points,
        # so 3072 was 25% padding riding through every NN matmul column
        scene_capacity=(2560 if not SMALL else 3072) if not SEGMENT else 8192,
        scene_key_capacity=(512 if SMALL else 1024) if SEGMENT else (256 if SMALL else 512),
        # SEGMENT: the surviving table floods the vote ranking — the true
        # pose can sit deep in the peak list (measured rank 5 at small
        # scale), so the ranked-candidate field and key budget both widen
        segment_scene=SEGMENT,
        remove_plane=SEGMENT,   # segmentation.cpp:94-110 table removal
        # region-growing gates at this sensor's working density (~7 mm at
        # 1 m): stub adjacent-normal steps ≈ 8°, so 7° would shatter it;
        # cylinder window curvature ≈ 0.02-0.05, so 0.04 would drop the
        # stub — the reference's values assume its denser close-range scans
        rg_smoothness_deg=12.0,
        cluster_max_curvature=0.08,
        rg_max_edge=0.05,
        # k_max must cover most of the descr_rad support at the working-set
        # density (~200 points in a 60 mm sphere at 7 mm spacing): 32 was
        # enough to truncate SHOT into noise and lose the detection
        k_max=96,
    )

    # Synthetic pipe joint at the reference's physical scale (chord r=0.08 m,
    # stub r=0.05 m — see tests/util.joint_points and SURVEY.md §0).
    rng = np.random.default_rng(7)
    n_chord, n_stub = (3_000, 1_800) if SMALL else (40_000, 24_000)
    theta = rng.uniform(0, 2 * np.pi, n_chord)
    h = rng.uniform(-0.3, 0.3, n_chord)
    chord = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)], 1)
    # stub inclined 30° (tests/util.joint_points geometry): a perpendicular
    # T-joint is symmetric under 180° about the stub axis, which makes the
    # ground-truth pose ambiguous — the incline breaks it
    theta2 = rng.uniform(0, 2 * np.pi, n_stub)
    h2 = rng.uniform(-0.15, 0.15, n_stub)
    stub_local = np.stack([0.05 * np.cos(theta2), 0.05 * np.sin(theta2), h2], 1)
    a30 = np.radians(30.0)
    R30 = np.array([[np.cos(a30), 0, np.sin(a30)], [0, 1, 0],
                    [-np.sin(a30), 0, np.cos(a30)]], np.float32)
    stub = stub_local @ R30.T + np.array([0, 0, 0.23], np.float32)
    model_xyz = np.concatenate([chord, stub]).astype(np.float32)

    bank = build_bank(
        model_xyz,
        descriptor=cfg.descriptor,
        descr_radius=cfg.descr_rad,
        rf_radius=cfg.rf_rad,
        frames=cfg.rf_frames,
        sampling_radius=cfg.model_ss,
        normal_k=cfg.normal_k,
        k_max=cfg.k_max,
        level=0 if SMALL else 1,   # 42 views at level 1, render.cpp:33-35
        resolution=64 if SMALL else 128,
        # descriptor surface at the organized working set's resolution: a
        # k_max-truncated radius support is only comparable between clouds
        # of similar density (see build_bank)
        surface_leaf=0.01,
        key_capacity=64 if SMALL else 256,
        icp_capacity=1024 if SMALL else 2048,
    )

    # The raw sensor frame: dense analytic raycast of the joint's cylinders
    # (every surface pixel carries depth, like the real 640×480 stream).
    T_pose = _bench_pose()
    cylinders = [
        (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
        (np.array([0.0, 0.0, 0.23]),
         np.array([np.sin(a30), 0.0, np.cos(a30)]), 0.05, 0.15),
    ]
    rects = []
    if SEGMENT:
        # workshop-table rectangle behind the joint (model +z points away
        # from the camera under _bench_pose, so "behind" is past the stub
        # tip at z=0.38): survives the curvature filter like the
        # reference's bench top, so the crop + matching must cope with it
        rects.append((np.array([0.0, 0.0, 0.45]),
                      np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                      0.35, 0.35))
    xyz_img = raycast_cylinders(cylinders, T_pose, width=W, height=H,
                                rects=rects)
    valid = np.isfinite(xyz_img).all(axis=-1)
    # realistic depth noise (σ = 0.5 mm along the ray, deterministic):
    # a benchmark that only detects on an analytically clean frame is
    # overfit — real sensors deliver mm-scale depth jitter
    rnoise = np.random.default_rng(42)
    sigma = rnoise.normal(0.0, 5e-4, (H, W)).astype(np.float32)
    with np.errstate(invalid="ignore"):
        xyz_img = xyz_img * (1.0 + sigma / np.maximum(xyz_img[..., 2], 0.1))[..., None]
    return np.nan_to_num(xyz_img), valid, bank, cfg, BLOCK, T_pose


def main():
    import jax.numpy as jnp

    from tpu_joints.pipelines.detect import detect
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    xyz_img_h, valid_h, bank, cfg, block, T_pose = build_problem()
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    half_window = 3 if SMALL else 5

    # the reference crops the work volume before anything else
    # (crop_pcd.cpp:109-127 PassThrough chain); the SEGMENT variant keeps
    # that order — crop box spans the joint plus the near table strip, so
    # region growing still has real clutter to reason about
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32) if SEGMENT else None
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32) if SEGMENT else None

    def run():
        scene, normals, curvature, n_sel = ingest_organized_blocks(
            xyz_img, valid, block=block, half_window=half_window,
            capacity=cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return detect(scene, bank, cfg, scene_normals=normals,
                      scene_curvature=curvature), n_sel

    res, n_sel = run()  # compile + warm
    jax.block_until_ready(res.full_pose)
    res, n_sel = run()
    jax.block_until_ready(res.full_pose)

    if THROUGHPUT:
        # steady-state serving rate: N frames in flight, one final sync.
        # Each frame gets a (cheap, device-side) distinct input so no
        # caching shortcut exists; the fitness fetch at the end depends on
        # every frame's compute.
        N = 4 if SMALL else 30
        jitter = [jnp.asarray(np.random.default_rng(i).normal(
            0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(4)]
        results = []
        t0 = time.perf_counter()
        for i in range(N):
            scene, normals, curvature, _ = ingest_organized_blocks(
                xyz_img + jitter[i % 4], valid, block=block,
                half_window=half_window, capacity=cfg.scene_capacity,
                crop_lo=crop_lo, crop_hi=crop_hi)
            results.append(detect(scene, bank, cfg, scene_normals=normals,
                                  scene_curvature=curvature))
        jax.block_until_ready([r.full_pose for r in results])
        ms = (time.perf_counter() - t0) * 1000.0 / N
        assert all(bool(r.accepted) for r in results[:2]), "pipeline broke"
        print(json.dumps({
            "metric": "scene_throughput",
            "value": round(1000.0 / ms, 3),
            "unit": "frames/s",
            "vs_baseline": round((1000.0 / ms) / (1000.0 / TARGET_MS), 3),
        }))
        print(f"# pipelined {N} frames, amortized {ms:.1f} ms/frame",
              file=sys.stderr)
        return

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        res, _ = run()
        jax.block_until_ready(res.full_pose)
        times.append((time.perf_counter() - t0) * 1000.0)
    ms = float(np.median(times))

    print(json.dumps({
        "metric": "scene_latency" if not SEGMENT else "scene_latency_segmented",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))
    T_est = np.asarray(res.full_pose)
    Rd = T_est[:3, :3] @ T_pose[:3, :3].T
    rot_err = float(np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1))))
    trans_err = float(np.linalg.norm(T_est[:3, 3] - T_pose[:3, 3]))
    print(
        f"# device={jax.devices()[0].device_kind} raw_points={int(valid_h.sum())} "
        f"working_set={int(n_sel)} fitness={float(res.fitness):.2e} "
        f"accepted={bool(res.accepted)} rot_err={rot_err:.2f}deg "
        f"trans_err={trans_err*1000:.1f}mm "
        f"min={min(times):.1f}ms max={max(times):.1f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
