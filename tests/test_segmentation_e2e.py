"""Golden end-to-end tests for the segmentation presets (VERDICT item 3).

The reference's flagship drivers crop the scene BEFORE any matching:
region growing over the scene's normals splits it into smooth clusters,
and only clusters whose mean curvature stays under a threshold survive
(``SHOT_demo.cpp:282-400``, ``FPFH_demo.cpp:283-402`` — flat/smooth pipe
surfaces pass, weld seams and clutter fail). These tests build a cluttered
scene (rendered joint view + table plane + noise blobs) and prove the
``segment_scene=True`` path of the ``shot_demo`` / ``fpfh_demo`` presets
end to end: the crop drops the clutter, keeps the joint, and the composed
pose still lands inside the golden tolerance.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from tpu_joints.config import PRESETS
from tpu_joints.core.cloud import make_cloud
from tpu_joints.core import transforms as tr
from tpu_joints.modelbank import build_bank, render_views
from tpu_joints.pipelines import detect

from tests.util import joint_points, knobby_joint_points, random_rotation


def _cluttered_problem(rng, maker=joint_points, seed_T=0):
    """(model_xyz, scene_xyz, T_gt, n_joint, n_clutter) — a joint view plus
    a smooth table plane and rough clutter blobs, all in camera frame."""
    model_xyz, _ = maker(rng, n_chord=1200, n_stub=700)
    rngT = np.random.default_rng(seed_T)
    T_world = np.eye(4, dtype=np.float32)
    T_world[:3, :3] = random_rotation(rngT)
    T_world[:3, 3] = rngT.uniform(-0.3, 0.3, 3).astype(np.float32)
    moved = model_xyz @ T_world[:3, :3].T + T_world[:3, 3]
    views, poses, _ = render_views(moved, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    joint = views[v]
    T_gt = poses[v] @ T_world

    lo, hi = joint.min(0), joint.max(0)
    # smooth table plane 4 cm past the joint's far side: a large low-curvature
    # cluster the reference's curvature filter KEEPS (like the workshop bench
    # top in Workshop_scene/*.pcd) — detection must cope with it surviving
    xs = np.arange(lo[0] - 0.25, hi[0] + 0.25, 0.025, dtype=np.float32)
    ys = np.arange(lo[1] - 0.25, hi[1] + 0.25, 0.025, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    plane = np.stack(
        [gx.ravel(), gy.ravel(),
         np.full(gx.size, hi[2] + 0.04, np.float32)], 1)
    # rough clutter: gaussian blobs well clear of the joint surface; their
    # normals are incoherent, so region growing shatters them into
    # sub-minimum clusters and the curvature filter drops the remainder
    blobs = []
    for i, off in enumerate([(-0.3, -0.25, -0.20), (0.3, 0.25, -0.15),
                             (0.0, -0.33, -0.25)]):
        # in front of the joint (negative z offset): nowhere near the plane,
        # so no lucky kNN edge can bridge a blob into a smooth cluster
        c = (lo + hi) / 2 + np.asarray(off, np.float32)
        blobs.append(c + rng.normal(0.0, 0.03, (150, 3)).astype(np.float32))
    clutter = np.concatenate(blobs)
    scene = np.concatenate([joint, plane, clutter]).astype(np.float32)
    return model_xyz, scene, T_gt, joint.shape[0], clutter.shape[0]


def _run_preset(rng, preset, maker, **bank_extra):
    cfg = dataclasses.replace(
        PRESETS[preset],
        # scale-dependent fields retuned to the synthetic test density; the
        # preset's structural fields (segment_scene, ratio matching, chained
        # full-CAD ICP + score2 gate) are what the test exercises
        descr_rad=0.15 if preset == "fpfh_demo" else 0.12,
        rf_rad=0.12, model_ss=0.03, normal_k=12,
        # the preset's radius normals (0.15, FPFH_demo.cpp:405-428) span
        # half the synthetic joint at this density and wash out the
        # curvature signal the crop keys off — keep kNN normals here
        normal_radius=0.0,
        # likewise the preset's keys-surface FPFH (the reference's sparse
        # sensor-scale parameterization): over this synthetic cloud's
        # ~170-key field it blurs the corner plates into the cylinders and
        # a flip wins — keep the working-set surface at test density (the
        # keys-surface space is exercised at full sensor scale by
        # bench.py's fpfh section and pinned by test_descriptors)
        fpfh_surface="cloud", fpfh_k_max=0,
        algorithm="gc" if preset == "fpfh_demo" else "hough",
        cg_size=0.05, cg_thresh=3.0, icp_iterations=20,
        # trim correspondences so the surviving table plane (a smooth
        # cluster the crop legitimately keeps) cannot pull the refinement
        icp_max_corr_dist=0.02, icp_max_corr_start=0.08,
        # the reference's 0.04 mean-curvature gate assumes dense sensor
        # clouds (k=100 supports on 640×480 frames, SHOT_demo.cpp:296-316);
        # at this synthetic density the joint clusters average ≈0.015 and
        # the noise blobs ≈0.14, so 0.08 separates them cleanly
        cluster_max_curvature=0.08,
        # likewise the 7° smoothness gate: adjacent-normal steps on the
        # synthetic cylinders run spacing/radius ≈ 0.03/0.08…0.05 rad
        # (≈20-35°), so 7° shatters the joint below min_cluster_size; 40°
        # keeps the cylinders whole while random-normal blobs still shatter
        rg_smoothness_deg=40.0,
        # cap graph edges near the point spacing so the blobs (≥10 cm off
        # any surface) cannot bridge into the plane/joint clusters
        rg_max_edge=0.06,
        ratio=0.95 if preset == "fpfh_demo" else 1.0,
        # 1024 keys: the crop keeps the joint plus a legitimate smooth
        # remnant of the table plane, ~800+ uniform samples at 0.03 — a
        # 768 budget thinned them uniformly (filters.compact_indices) and
        # GC lost every instance on the sparser field
        scene_capacity=8192, scene_key_capacity=1024, k_max=96,
        # FPFH on the knobby model: the corner plates' histograms are
        # near-identical to the table plane's, so plane keys flood the
        # ratio matches and GC groups a consistent wrong instance on the
        # table — SAC dominant-plane removal (segmentation.cpp:80-110,
        # retained in 6Dpose.cpp:287-358) clears it and the true pose wins
        # at 0.1°/1 mm. SHOT's LRF-binned histograms separate plate from
        # plane, so the shot_demo variant doesn't need it.
        remove_plane=(preset == "fpfh_demo"),
    )
    assert cfg.segment_scene, "preset must carry the reference's scene crop"
    model_xyz, scene_xyz, T_gt, n_joint, n_clutter = _cluttered_problem(
        rng, maker=maker)
    bank = build_bank(
        model_xyz, descriptor=cfg.descriptor, descr_radius=cfg.descr_rad,
        rf_radius=cfg.rf_rad, sampling_radius=cfg.model_ss,
        normal_k=cfg.normal_k, k_max=cfg.k_max,
        # descriptor-space agreement: the fpfh_demo preset computes FPFH
        # over the keypoint cloud (fpfh_surface="keys"); the bank must too
        fpfh_surface=cfg.fpfh_surface, fpfh_k_max=cfg.fpfh_k_max,
        level=0, resolution=96, key_capacity=128, **bank_extra,
    )
    scene = make_cloud(scene_xyz, capacity=cfg.scene_capacity)
    res = detect(scene, bank, cfg)
    kept = int(np.asarray(res.metrics["scene_points"]))
    total = scene_xyz.shape[0]
    assert kept < total - 0.8 * n_clutter, (
        f"crop kept {kept}/{total}: clutter not removed")
    assert kept > 0.8 * n_joint, f"crop kept only {kept} (joint lost)"
    assert bool(res.accepted), (
        f"fitness={float(res.fitness)}, full={float(res.full_fitness)}")
    assert float(res.full_fitness) < cfg.final_accept_fitness
    T_est = np.asarray(res.full_pose)
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_gt[:3, :3]),
                                         jnp.asarray(T_est[:3, :3])))
    terr = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    assert ang < 1.5, f"rotation error {ang}°"
    assert terr < 0.008, f"translation error {terr*1000:.1f} mm"


def test_shot_demo_segmented_scene(rng):
    """SHOT_demo.cpp:282-400 analog: crop → SHOT → ratio match → Hough →
    chained full-CAD ICP, on a cluttered scene."""
    _run_preset(rng, "shot_demo", joint_points)


def test_fpfh_demo_segmented_scene(rng):
    """FPFH_demo.cpp:283-402 analog (knobby joint: FPFH needs corner
    features to disambiguate positions along smooth cylinder bodies)."""
    _run_preset(rng, "fpfh_demo", knobby_joint_points)
