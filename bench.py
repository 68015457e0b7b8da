"""Headline benchmark: RAW sensor frame → 6D pose, one chip, end to end.

The reference's live path starts from a full 640×480 organized sensor cloud
(307,200 points — ``ROS_server.cpp:2138``, ``crop_pcd.cpp:76-77``) and runs
NaN filtering, normal estimation, downsampling, SHOT-352 against a 42-view
bank, Hough grouping, and ICP refinement (``SHOT.cpp:204-523``). Its most
complete drivers additionally crop the scene first: dominant-plane removal
+ region growing + per-cluster curvature filtering
(``SHOT_demo.cpp:282-400``, ``segmentation.cpp:94-110``). One run of this
benchmark measures BOTH chains on one TPU chip, plus the pipelined serving
rate, and sweeps pose×noise robustness:

  640×480 organized cloud (dense analytic raycast, σ=0.5 mm depth noise)
    → on-device ingest: stencil normals + per-tile downsample
      [+ lattice plane removal / region growing / curvature filter]
    → detect: keypoints → SHOT-352 → match all 42 views → Hough → batched
      ICP → composed full-CAD pose             (pipelines.detect)

The reference publishes no numbers (BASELINE.md); the north-star target is
< 50 ms/scene. Prints one JSON line per metric (vs_baseline > 1 beats the
target):
  scene_latency             — raw frame → pose, single-part 42-view bank
  scene_latency_segmented   — same with the lattice segmentation crop chain
  scene_latency_two_part    — the flagship {chord, stub} × 42-view search
  scene_throughput          — pipelined streaming rate (frames/s)
  scene_throughput_batch8   — batched-dispatch serving rate (frames/s)
  device_compute_ms         — pure device compute (dispatch floor removed)
  shot_descriptors_per_sec  — descriptor-stage rate
  scene_latency_fpfh        — FPFH_demo.cpp's chain at its own parameters
plus robustness-sweep summaries (pose×noise draws incl. a two-instance
scene) on stderr.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
# persistent compile cache only on the TPU backend: XLA:CPU AOT entries are
# pinned to the compiling host's CPU features and crash/SIGILL when the
# machine changes (see tests/conftest.py). Gate on the RESOLVED backend,
# not the env var: with JAX_PLATFORMS unset on a CPU-only host jax still
# falls back to CPU and must not enable the cache.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

TARGET_MS = 50.0

# BENCH_SMALL=1 shrinks the problem for CI/CPU smoke-validation of the
# script itself; headline numbers come from the full-size TPU run.
SMALL = os.environ.get("BENCH_SMALL") == "1"
# Optional single-section runs for profiling; the default runs everything.
# BENCH_ONLY=latency|segment|two_part|throughput|batch|device|descriptors|
#            fpfh|sweep|instances
ONLY = os.environ.get("BENCH_ONLY", "")


def _pose(ay_deg: float, ax_deg: float, t) -> np.ndarray:
    ay, ax = np.radians(ay_deg), np.radians(ax_deg)
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rx @ Ry
    T[:3, 3] = np.asarray(t, np.float32)
    return T


def _bench_pose() -> np.ndarray:
    """A fixed, well-conditioned pose: both chord and stub clearly visible."""
    return _pose(35.0, -20.0, [0.02, -0.03, 1.0])


# pose×noise sweep grid (VERDICT round-3 item 8). Entries are
# (T, noise_seed, must_detect):
#   must_detect=True  — the stub (the joint's only symmetry-breaking
#     feature) is clearly visible (≥6% of surface pixels, full length):
#     the pipeline must accept AND be accurate;
#   must_detect=False — adversarial views where the stub is nearly
#     invisible (2-4% of pixels / seen end-on), making the pose close to
#     genuinely ambiguous: the pipeline may reject, but must NEVER return
#     an accepted wrong pose (the coverage gate's job).
SWEEP = [
    (_pose(35.0, -20.0, [0.02, -0.03, 1.0]), 42, True),
    (_pose(20.0, 25.0, [0.05, -0.05, 0.90]), 3, True),
    (_pose(-15.0, -30.0, [-0.03, 0.00, 1.05]), 4, True),
    (_pose(-30.0, 15.0, [-0.04, 0.02, 0.95]), 1, False),   # stub 2.2%
    (_pose(55.0, -10.0, [0.00, 0.05, 1.10]), 2, False),    # stub end-on
]


def _make_config():
    from tpu_joints.config import DetectionConfig

    return DetectionConfig(
        descriptor="shot",
        descr_rad=0.06,
        model_ss=0.02,
        # SMALL samples at 0.03 so the ~210 selected keys fit the 256
        # budget without uniform thinning (filters.compact_indices): the
        # shrunken 12-view bank is marginal and loses the pose when the
        # key field is decimated OR enlarged (measured: prefix-256 of 397
        # works, decimated-256 and full-397 both flip — the smoke config
        # needs the selection to FIT, full scale fits by construction)
        scene_ss=0.03 if SMALL else 0.02,
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
        # rf_k_max == k_max && rf_rad == descr_rad → prepare_scene shares
        # ONE support gather between SHOT and BOARD (the duplicate k=256
        # gather was ~6 ms of the 17 ms device compute); 96 covers the
        # 60 mm support at this working density (~200 pts) as well for
        # voting frames as it does for the descriptor. SMALL keeps the
        # old 256: its marginal 12-view bank was tuned around wide BOARD
        # support and flips at 96 (full scale is the acceptance gate)
        rf_k_max=256 if SMALL else 96,
        cg_size=0.05,
        cg_thresh=3.0,
        icp_iterations=6,
        icp_point_to_plane=True,
        icp_max_corr_dist=0.02,
        icp_max_corr_start=0.2,
        # SHOT_demo's full-CAD polish + score2<0.006 gate; SMALL's
        # 1024-row polish needs the extra iterations for sub-degree poses
        # (point-to-plane: ≈ 0.2°/0.6 mm full scale)
        final_icp_iterations=8 if SMALL else 6,
        # 16 ranked candidates: under sensor noise the true pose can sit
        # deep in the Hough peak list (measured rank ~10 at 0.5 mm noise);
        # the full-CAD ranking picks it out of the wider field for a few
        # ms of extra folded-row ICP work
        max_candidates=16,
        # TWO rotation modes per view (top Hough peak split into its true
        # and 180°-flipped match clusters — they share the translation
        # bin, so on ~2/4 noise draws the flip owned the per-bin Umeyama
        # and the true pose was absent from the WHOLE candidate field;
        # the coverage ranking can only save what is present), cut grouped
        # by view (top 8 views × both modes). View grouping keeps spam
        # views from flooding the cut (the old failure mode that forced
        # P=1): each admitted view costs exactly P slots and views rank by
        # their best bin. ICP candidate count (16) and every Pallas shape
        # unchanged.
        max_instances_per_view=2,
        view_grouped_candidates=True,
        split_rotation_modes=True,
        # two-tier refinement: all 16 candidates ICP'd + ranked at 512
        # rows, then the full 2048-row polish + dense coverage on the top
        # 4 — ~4× less NN distance work on the latency-dominant stage
        refine_top=4,
        tier1_rows=512,
        # ranking needs candidates near their basins, not converged: 4
        # p2plane iterations separate true-vs-flip coverage as well as 6
        # and tier 2 re-polishes the survivors at the full budget from
        # whatever tier 1 reached (3 was too coarse: the winner's tier-2
        # polish converged to a 1.68° local optimum; 4 lands at 0.17°)
        tier1_iterations=4,
        # ...split per stage (r5, scripts/exp_latency_levers.py): the VIEW
        # ICP runs 3 iterations — paired A/B on TPU shaved 2-3 ms off the
        # two-part chain at unchanged accuracy (0.26°/0.42 mm) — while the
        # RANKING polish keeps 4 (3 there re-opened the 1.68° local
        # optimum above, measured: polish=3 cost +0.9° and +4 ms)
        tier1_view_iterations=3,
        tier1_polish_iterations=4,
        # 2560 lanes: the 640x480/BLOCK=4 working set is ~2420 points,
        # so 3072 was 25% padding riding through every NN matmul column.
        # The segmented chain runs at the SAME capacity: its lattice crop
        # removes the table BEFORE compaction (pipelines.ingest), so the
        # working set is the same joint surface — and both chains share
        # one set of compiled detect executables.
        scene_capacity=3072 if SMALL else 2560,
        # full scale: ~490 selected at 0.02 fit 512 exactly; SMALL's 256
        # budget is matched by its 0.03 sampling radius (see scene_ss)
        scene_key_capacity=256 if SMALL else 512,
        # the scene is object-only (default frame) or segmentation-cropped
        # (segmented frame), so the coverage acceptance gate is sound: a
        # winner stranding > 2% of scene points (e.g. a flip with the stub
        # barely visible) is rejected rather than reported
        coverage_accept=0.02,
        # region-growing gates at this sensor's working density (~7 mm at
        # 1 m): stub adjacent-normal steps ≈ 8°, so 7° would shatter it;
        # cylinder window curvature ≈ 0.02-0.05, so 0.04 would drop the
        # stub — the reference's values assume its denser close-range scans
        rg_smoothness_deg=12.0,
        cluster_max_curvature=0.08,
        rg_max_edge=0.05,
        # the lattice front end does plane removal + region growing itself
        # (ingest_organized_segmented reads these flags); detect gets a
        # copy with both turned off (det_cfg below)
        remove_plane=True,
        segment_scene=True,
        # k_max must cover most of the descr_rad support at the working-set
        # density (~200 points in a 60 mm sphere at 7 mm spacing): 32 was
        # enough to truncate SHOT into noise and lose the detection
        k_max=96,
    )


def _joint_parts():
    """The synthetic pipe joint's two CAD pieces in the shared joint frame
    (chord r=0.08 m; stub r=0.05 m inclined 30° — a perpendicular T-joint
    is symmetric under 180° about the stub axis, which makes the
    ground-truth pose ambiguous; the incline breaks it). Returns
    (chord, stub) float32 arrays — the reference's iros_data part clouds
    (``SHOT_demo.cpp:430-461``). See tests/util.joint_points."""
    rng = np.random.default_rng(7)
    n_chord, n_stub = (3_000, 1_800) if SMALL else (40_000, 24_000)
    theta = rng.uniform(0, 2 * np.pi, n_chord)
    h = rng.uniform(-0.3, 0.3, n_chord)
    chord = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)], 1)
    theta2 = rng.uniform(0, 2 * np.pi, n_stub)
    h2 = rng.uniform(-0.15, 0.15, n_stub)
    stub_local = np.stack([0.05 * np.cos(theta2), 0.05 * np.sin(theta2), h2], 1)
    a30 = np.radians(30.0)
    R30 = np.array([[np.cos(a30), 0, np.sin(a30)], [0, 1, 0],
                    [-np.sin(a30), 0, np.cos(a30)]], np.float32)
    stub = stub_local @ R30.T + np.array([0, 0, 0.23], np.float32)
    # weld cutouts — a REAL two-part joint has no surface inside the other
    # part: the chord wall has a hole where the stub pipe welds on, and
    # the stub tube ends in a saddle curve on the chord surface. The cut
    # rims are what break each part's cylinder symmetry: without them a
    # part-bank search can recover the chord axis but never the spin
    # (measured: every chord-part candidate lands ~180° spin-flipped at
    # the right location). The reference's iros_data part clouds carry
    # the same geometry (they are pieces of stubcad.pcd).
    stub_c = np.array([0, 0, 0.23], np.float32)
    stub_ax = np.array([np.sin(a30), 0.0, np.cos(a30)], np.float32)
    rel = chord - stub_c
    t_ax = rel @ stub_ax
    radial = rel - t_ax[:, None] * stub_ax
    # near-side hole only (the extended stub line would also pierce the
    # far chord wall, where the real joint keeps its surface)
    hole = (np.linalg.norm(radial, axis=1) < 0.05) & (t_ax > -0.25)
    chord = chord[~hole]
    inside_chord = np.linalg.norm(stub[:, 1:], axis=1) < 0.08
    stub = stub[~inside_chord]
    return chord.astype(np.float32), stub.astype(np.float32)


def _joint_model():
    """The full joint CAD (the reference's stubcad.pcd)."""
    return np.concatenate(_joint_parts())


_CYL_A30 = np.radians(30.0)
_CYLINDERS = [
    (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
    (np.array([0.0, 0.0, 0.23]),
     np.array([np.sin(_CYL_A30), 0.0, np.cos(_CYL_A30)]), 0.05, 0.15),
]


def _joint_model_diag():
    """Second sweep geometry (VERDICT r3 weak 7): a 45° DIAGONAL joint —
    thinner chord (r=0.07), thinner/shorter stub (r=0.045, ±0.12) at 45°
    (the reference's own result set shows multiple joint types,
    ``Results/diag_result1.png``). Same point counts/physical scale as the
    primary joint so every compiled executable is reused; only the bank
    arrays differ."""
    rng = np.random.default_rng(11)
    n_chord, n_stub = (3_000, 1_800) if SMALL else (40_000, 24_000)
    theta = rng.uniform(0, 2 * np.pi, n_chord)
    h = rng.uniform(-0.3, 0.3, n_chord)
    chord = np.stack([h, 0.07 * np.cos(theta), 0.07 * np.sin(theta)], 1)
    theta2 = rng.uniform(0, 2 * np.pi, n_stub)
    h2 = rng.uniform(-0.12, 0.12, n_stub)
    stub_local = np.stack(
        [0.045 * np.cos(theta2), 0.045 * np.sin(theta2), h2], 1)
    a45 = np.radians(45.0)
    R45 = np.array([[np.cos(a45), 0, np.sin(a45)], [0, 1, 0],
                    [-np.sin(a45), 0, np.cos(a45)]], np.float32)
    stub = stub_local @ R45.T + np.array([0, 0, 0.19], np.float32)
    return np.concatenate([chord, stub]).astype(np.float32)


_CYL_A45 = np.radians(45.0)
_CYLINDERS_DIAG = [
    (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.07, 0.3),
    (np.array([0.0, 0.0, 0.19]),
     np.array([np.sin(_CYL_A45), 0.0, np.cos(_CYL_A45)]), 0.045, 0.12),
]

# sweep grid for the diagonal joint: same pose family as SWEEP. The 45°
# stub protrudes farther than the 30° one, so more poses keep it usable;
# must_detect flags verified against measured TPU stub-pixel fractions.
SWEEP_DIAG = [
    (_pose(35.0, -20.0, [0.02, -0.03, 1.0]), 42, True),
    (_pose(20.0, 25.0, [0.05, -0.05, 0.90]), 3, True),
    (_pose(-15.0, -30.0, [-0.03, 0.00, 1.05]), 4, True),
    (_pose(-30.0, 15.0, [-0.04, 0.02, 0.95]), 1, False),
    (_pose(55.0, -10.0, [0.00, 0.05, 1.10]), 2, False),
]
# workshop-table rectangle behind the joint (model +z points away from the
# camera under _bench_pose, so "behind" is past the stub tip at z=0.38):
# a large smooth plane like the reference's bench top — the segmented
# chain must remove it (segmentation.cpp:94-110)
_TABLE = [(np.array([0.0, 0.0, 0.45]),
           np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
           0.35, 0.35)]


def _frame(T_pose: np.ndarray, seed: int, with_table: bool,
           cylinders=None):
    """Dense analytic raycast of the joint (+ optional table) with
    realistic depth noise (σ = 0.5 mm along the ray, deterministic): a
    benchmark that only detects on an analytically clean frame is overfit
    — real sensors deliver mm-scale depth jitter. ``cylinders`` overrides
    the default joint primitives (second sweep geometry / multi-instance
    scenes)."""
    from tpu_joints.serve.depth import raycast_cylinders

    W, H = (320, 240) if SMALL else (640, 480)
    xyz_img = raycast_cylinders(
        _CYLINDERS if cylinders is None else cylinders, T_pose,
        width=W, height=H, rects=_TABLE if with_table else [])
    valid = np.isfinite(xyz_img).all(axis=-1)
    rnoise = np.random.default_rng(seed)
    sigma = rnoise.normal(0.0, 5e-4, (H, W)).astype(np.float32)
    with np.errstate(invalid="ignore"):
        xyz_img = xyz_img * (
            1.0 + sigma / np.maximum(xyz_img[..., 2], 0.1))[..., None]
    return np.nan_to_num(xyz_img), valid


def build_problem(with_table: bool = False):
    """(xyz_img, valid, bank, cfg, block, T_pose) — kept as the shared
    problem-builder entry for profiling scripts."""
    from tpu_joints.modelbank import build_bank

    cfg = _make_config()
    T_pose = _bench_pose()
    xyz_img, valid = _frame(T_pose, 42, with_table)
    bank = build_bank(
        _joint_model(),
        descriptor=cfg.descriptor,
        descr_radius=cfg.descr_rad,
        rf_radius=cfg.rf_rad,
        rf_k_max=cfg.rf_k_max,   # symmetric support truncation with the scene
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
    return xyz_img, valid, bank, cfg, (2 if SMALL else 4), T_pose


def build_part_banks(cfg):
    """{chord, stub} part banks sharing the FULL joint CAD — the
    reference's flagship search shape: every driver loops both part banks
    (``SHOT_demo.cpp:430-461``, ``FPFH_demo.cpp:436-467``) and composes/
    gates the winner against ``stubcad.pcd`` (``SHOT_demo.cpp:245``)."""
    from tpu_joints.core.cloud import bucket_size
    from tpu_joints.modelbank import build_bank
    from tpu_joints.modelbank.scanner import render_views

    chord, stub = _joint_parts()
    full = np.concatenate([chord, stub])
    part_views = {}
    for name, part in (("chord", chord), ("stub", stub)):
        views, poses, _ = render_views(
            part, level=0 if SMALL else 1, resolution=64 if SMALL else 128)
        part_views[name] = (views, poses)
    # common view capacity: the part banks concatenate along the view axis
    vc = bucket_size(max(max(v.shape[0] for v in vs)
                         for vs, _ in part_views.values()))
    return {
        name: build_bank(
            full, views=vs, poses=ps, view_capacity=vc,
            descriptor=cfg.descriptor, descr_radius=cfg.descr_rad,
            rf_radius=cfg.rf_rad, rf_k_max=cfg.rf_k_max,
            frames=cfg.rf_frames, sampling_radius=cfg.model_ss,
            normal_k=cfg.normal_k, k_max=cfg.k_max, surface_leaf=0.01,
            key_capacity=64 if SMALL else 256,
            icp_capacity=1024 if SMALL else 2048)
        for name, (vs, ps) in part_views.items()
    }


def _err(T_est: np.ndarray, T_gt: np.ndarray):
    Rd = T_est[:3, :3] @ T_gt[:3, :3].T
    rot = float(np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1))))
    trans = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    return rot, trans


_ADD_MODELS = {}


def _add_err(T_est: np.ndarray, T_gt: np.ndarray,
             geometry: str = "joint30") -> float:
    """Pose ADD metric (BASELINE.json): mean distance between the model
    points placed at the estimated vs ground-truth pose."""
    m = _ADD_MODELS.get(geometry)
    if m is None:  # ~4k points is plenty for a mean
        m = (_joint_model() if geometry == "joint30"
             else _joint_model_diag())[::16]
        _ADD_MODELS[geometry] = m
    a = m @ T_est[:3, :3].T + T_est[:3, 3]
    b = m @ T_gt[:3, :3].T + T_gt[:3, 3]
    return float(np.linalg.norm(a - b, axis=1).mean())


def main():
    import dataclasses

    import jax.numpy as jnp

    from tpu_joints.pipelines.detect import detect_organized
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    xyz_img_h, valid_h, bank, cfg, block, T_pose = build_problem()
    seg_img_h, seg_valid_h = _frame(T_pose, 42, with_table=True)
    xyz_img, valid = jnp.asarray(xyz_img_h), jnp.asarray(valid_h)
    seg_img, seg_valid = jnp.asarray(seg_img_h), jnp.asarray(seg_valid_h)
    half_window = 3 if SMALL else 5

    # the reference crops the work volume before anything else
    # (crop_pcd.cpp:109-127 PassThrough chain); the crop box spans the
    # joint plus the near table strip, so the segmented chain still has
    # real clutter to remove
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    # detect never re-segments: the lattice front end owns the crop chain
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)

    # both chains go through the fused entry (detect_organized) and share
    # the SAME match-refine executable: the only difference is the cfg
    # carrying the crop flags (det_cfg routes to the plain ingest).
    # BENCH_FUSED=0 falls back to the two-dispatch split for comparison.
    fused = os.environ.get("BENCH_FUSED", "1") == "1"

    def run(img=xyz_img, vmask=valid):
        return detect_organized(img, vmask, bank, det_cfg, block=block,
                                half_window=half_window,
                                crop_lo=crop_lo, crop_hi=crop_hi,
                                fused=fused)

    # the segmented chain keeps the FULL 4-iteration tier-1 view budget:
    # the r5 per-chain A/B (scripts/exp_latency_levers.py) validated the
    # view=3 cut on the plain and two-part chains only, and the first
    # full r5 run showed why that mattered — the segmented winner landed
    # at 1.23° (vs 0.00° in r4 at view=4): its cropped working set enters
    # tier 1 from coarser Hough bins and needs the extra round to reach
    # the tier-2 basin. ~1 ms of its ~5 ms headroom buys the accuracy back.
    seg_cfg = dataclasses.replace(cfg, tier1_view_iterations=4)

    def run_segmented(img=seg_img, vmask=seg_valid):
        return detect_organized(img, vmask, bank, seg_cfg, block=block,
                                half_window=half_window,
                                crop_lo=crop_lo, crop_hi=crop_hi,
                                fused=fused)

    def timed(fn, label, poses=None, extra=None):
        res, n_sel = fn()  # compile + warm
        jax.block_until_ready(res.full_pose)
        res, n_sel = fn()
        jax.block_until_ready(res.full_pose)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            res, _ = fn()
            jax.block_until_ready(res.full_pose)
            times.append((time.perf_counter() - t0) * 1000.0)
        ms = float(np.median(times))
        print(json.dumps({
            "metric": label,
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(TARGET_MS / ms, 3),
        }))
        rot_err, trans_err = _err(np.asarray(res.full_pose), T_pose)
        add_err = _add_err(np.asarray(res.full_pose), T_pose)
        if os.environ.get("BENCH_DEBUG"):
            from tpu_joints.core.transforms import compose as _compose
            full = np.asarray(jax.vmap(_compose)(
                res.cand_poses,
                (bank.poses if poses is None else poses)[res.cand_views]))
            for c in range(full.shape[0]):
                r, t_ = _err(full[c], T_pose)
                print(f"#   cand{c:2d} view={int(res.cand_views[c]):2d} "
                      f"valid={bool(res.cand_valid[c])} "
                      f"fit={float(res.cand_fitness[c]):.3e} "
                      f"rot={r:7.2f} trans={t_ * 1000:7.1f}", file=sys.stderr)
        print(
            f"# {label}: device={jax.devices()[0].device_kind} "
            f"working_set={int(n_sel)} fitness={float(res.fitness):.2e} "
            # res.fitness is the winner's VIEW-ICP fitness — tier-1
            # stride-reduced under two-tier refinement (ranking-grade);
            # acceptance gates on the tier-2 full-CAD fitness below
            f"full_fitness={float(res.full_fitness):.2e} "
            f"accepted={bool(res.accepted)} rot_err={rot_err:.2f}deg "
            f"trans_err={trans_err*1000:.1f}mm add={add_err*1000:.1f}mm "
            f"min={min(times):.1f}ms max={max(times):.1f}ms"
            + (extra(res) if extra else ""),
            file=sys.stderr,
        )
        return ms, res

    def assert_north_star(label, res):
        # BASELINE.md: < 1° rotation / < 5 mm translation. Fail LOUDLY
        # (ADVICE r4: the FPFH chain's 1.27° passed its gates silently) —
        # a miss here must crash the artifact, not hide in a comment.
        if SMALL:
            return
        rot, trans = _err(np.asarray(res.full_pose), T_pose)
        assert bool(res.accepted) and rot < 1.0 and trans < 0.005, (
            f"{label} missed the north star: accepted={bool(res.accepted)} "
            f"rot={rot:.2f}deg trans={trans*1000:.1f}mm")

    if ONLY in ("", "latency"):
        _, res_l = timed(run, "scene_latency")
        assert_north_star("scene_latency", res_l)
    if ONLY in ("", "segment"):
        _, res_s = timed(run_segmented, "scene_latency_segmented")
        assert_north_star("scene_latency_segmented", res_s)

    if ONLY in ("", "two_part"):
        # the reference's TRUE flagship shape: every driver searches BOTH
        # part banks — {chord, stub} × 42 views (SHOT_demo.cpp:430-461) —
        # and gates the winner against the full joint CAD. Same segmented
        # frame and config as scene_latency_segmented; only the search
        # width doubles (one pooled device program, per-part top-C
        # candidate selection — pipelines.multi.detect_parts_organized).
        from tpu_joints.pipelines.multi import detect_parts_organized

        # max_candidates=8 PER PART keeps every Pallas ICP NN call in the
        # two-part executable at the same query-row count as the proven
        # single-part program (tier1 2·8·512 = polish 16·512 = tier2
        # 4·2048 = 8192 rows): exactly ONE Mosaic program per process —
        # the empirically safe TPU runtime envelope. C=16 per part (M=16k
        # tier-1 rows alongside M=8k tier-2) puts TWO distinct Mosaic
        # programs in the process and reproducibly trips the runtime's
        # re-execution fault (INVALID_ARGUMENT — docs/PERFORMANCE.md
        # 'TPU runtime fault').
        two_cfg = dataclasses.replace(cfg, max_candidates=8)
        part_banks = build_part_banks(two_cfg)
        cat_poses = jnp.concatenate(
            [part_banks[n].poses for n in ("chord", "stub")])
        Vp = part_banks["chord"].n_views

        def run_two_part():
            names, res, n_sel = detect_parts_organized(
                seg_img, seg_valid, part_banks, two_cfg, block=block,
                half_window=half_window, crop_lo=crop_lo, crop_hi=crop_hi)
            return res, n_sel

        def _part_extra(res):
            return f" part={('chord', 'stub')[int(res.view_idx) // Vp]}"

        _, res2 = timed(run_two_part, "scene_latency_two_part",
                        poses=cat_poses, extra=_part_extra)
        if not SMALL:
            rot2, trans2 = _err(np.asarray(res2.full_pose), T_pose)
            assert bool(res2.accepted) and rot2 < 1.0 and trans2 < 0.005, (
                f"two-part flagship missed the pose: accepted="
                f"{bool(res2.accepted)} rot={rot2:.2f}deg "
                f"trans={trans2*1000:.1f}mm")

    if ONLY in ("", "throughput"):
        # steady-state serving rate: N frames in flight, one final sync.
        # Each frame gets a (cheap, device-side) distinct input so no
        # caching shortcut exists; the pose fetch at the end depends on
        # every frame's compute. The ~30 ms control-channel roundtrip of
        # this environment's remote TPU attachment amortizes away, so the
        # number approaches pure device compute (the steady-state of a
        # streaming server — BASELINE.json's scenes/sec metric).
        run()  # ensure warm
        N = 4 if SMALL else 30
        # frames are pre-built on device (as a server's already-ingested
        # inputs would be) so the timed loop issues exactly ONE dispatch
        # per frame — the per-frame jitter add used to be a second
        # dispatch and throttled the stream at the tunnel's issue rate
        frames = [xyz_img + jnp.asarray(np.random.default_rng(i).normal(
            0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(4)]
        jax.block_until_ready(frames)
        results = []
        t0 = time.perf_counter()
        for i in range(N):
            res, _ = run(frames[i % 4], valid)
            results.append(res)
        jax.block_until_ready([r.full_pose for r in results])
        ms = (time.perf_counter() - t0) * 1000.0 / N
        # integrity gate, not a robustness gate (the sweep below owns that):
        # every ACCEPTED frame must carry an accurate pose — an occasional
        # honest rejection (a noise draw where the true pose drops out of
        # the Hough candidate field and the coverage gate refuses the flip)
        # is correct serving behavior, not a broken pipeline
        n_ok = 0
        for r in results:
            if bool(r.accepted):
                rot_i, trans_i = _err(np.asarray(r.full_pose), T_pose)
                assert rot_i < 5.0 and trans_i < 0.020, (
                    f"accepted wrong pose: {rot_i:.1f}deg {trans_i*1000:.1f}mm")
                n_ok += 1
        assert n_ok >= max(1, int(0.7 * N)), f"only {n_ok}/{N} accepted"
        print(json.dumps({
            "metric": "scene_throughput",
            "value": round(1000.0 / ms, 3),
            "unit": "frames/s",
            "vs_baseline": round((1000.0 / ms) / (1000.0 / TARGET_MS), 3),
        }))
        print(f"# pipelined {N} frames, amortized {ms:.1f} ms/frame",
              file=sys.stderr)

    if ONLY in ("", "throughput", "batch"):
        # batched serving: drain the queue into [B] frames per dispatch
        # (detect_organized_batch) — dispatch latency amortizes over the
        # batch, so this is the per-chip scenes/sec a saturated server
        # actually delivers (BASELINE.json's stated metric)
        from tpu_joints.pipelines.detect import detect_organized_batch

        B = 2 if SMALL else 8
        imgs = jnp.stack([xyz_img + jnp.asarray(
            np.random.default_rng(i).normal(0, 1e-4, xyz_img_h.shape)
            .astype(np.float32)) for i in range(B)])
        valids = jnp.broadcast_to(valid, (B,) + valid.shape)

        def run_batch():
            return detect_organized_batch(
                imgs, valids, bank, det_cfg, block=block,
                half_window=half_window, crop_lo=crop_lo, crop_hi=crop_hi)

        res_b, _ = run_batch()
        jax.block_until_ready(res_b.full_pose)
        reps = 2 if SMALL else 6
        rounds = []
        t0 = time.perf_counter()
        for _ in range(reps):
            res_b, _ = run_batch()
            rounds.append(res_b)
        jax.block_until_ready([r.full_pose for r in rounds])
        ms = (time.perf_counter() - t0) * 1000.0 / (reps * B)
        n_ok = 0
        poses_b = np.asarray(rounds[-1].full_pose)
        acc_b = np.asarray(rounds[-1].accepted)
        for i in range(B):
            if bool(acc_b[i]):
                rot_i, trans_i = _err(poses_b[i], T_pose)
                assert rot_i < 5.0 and trans_i < 0.020, (
                    f"batch accepted wrong pose: {rot_i:.1f}deg")
                n_ok += 1
        assert n_ok >= max(1, int(0.7 * B)), f"only {n_ok}/{B} accepted"
        print(json.dumps({
            "metric": "scene_throughput_batch8",
            "value": round(1000.0 / ms, 3),
            "unit": "frames/s",
            "vs_baseline": round((1000.0 / ms) / (1000.0 / TARGET_MS), 3),
        }))
        print(f"# batched B={B}: {ms:.1f} ms/frame amortized, "
              f"{n_ok}/{B} accepted", file=sys.stderr)

    if ONLY in ("", "device"):
        # device-compute isolation (VERDICT r4 item 4): time the fused
        # detect called once vs twice inside ONE jitted dispatch with
        # distinct inputs (no CSE); the marginal cost of the second call
        # is pure device compute — the ~30 ms remote-attachment
        # dispatch+sync roundtrip cancels in the difference
        # (scripts/exp_marginal_compute.py is the standalone version with
        # the ×4 cross-check). This is the number rooflined against v5e
        # peak in docs/PERFORMANCE.md.
        j1 = jnp.asarray(np.random.default_rng(101).normal(
            0, 1e-4, xyz_img_h.shape).astype(np.float32))
        j2 = jnp.asarray(np.random.default_rng(102).normal(
            0, 1e-4, xyz_img_h.shape).astype(np.float32))

        def one(img):
            res, _ = detect_organized(
                img, valid, bank, det_cfg, block=block,
                half_window=half_window, crop_lo=crop_lo, crop_hi=crop_hi,
                fused=True)
            return res.full_pose

        f1 = jax.jit(lambda: one(xyz_img + j1).sum())
        f2 = jax.jit(lambda: one(xyz_img + j1).sum()
                     + one(xyz_img + j2).sum())

        def med(f):
            jax.block_until_ready(f())
            ts = []
            for _ in range(10):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                ts.append((time.perf_counter() - t0) * 1000.0)
            return float(np.median(ts))

        t1, t2 = med(f1), med(f2)
        dev = max(t2 - t1, 0.0)
        print(json.dumps({
            "metric": "device_compute_ms",
            "value": round(dev, 3),
            "unit": "ms",
            "vs_baseline": round(TARGET_MS / max(dev, 1e-9), 3),
        }))
        print(f"# device_compute: x1={t1:.1f}ms x2={t2:.1f}ms -> "
              f"device={dev:.1f}ms dispatch+sync~{t1 - dev:.1f}ms",
              file=sys.stderr)

    if ONLY in ("", "descriptors"):
        # SHOT descriptors/sec (BASELINE.json's stated metric): the full
        # descriptor stage — radius support gather + LRF + separable
        # quadrilinear SHOT-352 — at the pipeline's working shapes
        from tpu_joints.features.shot import compute_shot

        scene, normals, _, _ = ingest_organized_blocks(
            xyz_img, valid, block=block, half_window=half_window,
            capacity=cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        from tpu_joints.filters import compact_cloud, uniform_sample_mask

        keys, _ = compact_cloud(scene, uniform_sample_mask(scene, cfg.scene_ss),
                                cfg.scene_key_capacity)
        shot = jax.jit(functools.partial(
            compute_shot, radius=cfg.descr_rad, k_max=cfg.k_max))
        out = shot(keys, scene, normals)
        jax.block_until_ready(out[0])
        reps = 3 if SMALL else 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = shot(keys, scene, normals)
        jax.block_until_ready(out[0])
        per_desc = (time.perf_counter() - t0) / (reps * cfg.scene_key_capacity)
        print(json.dumps({
            "metric": "shot_descriptors_per_sec",
            "value": round(1.0 / per_desc, 1),
            "unit": "desc/s",
            # no reference number exists (BASELINE.md publishes none); scale
            # against the latency target's descriptor share instead: the
            # scene's key budget at 50 ms/scene
            "vs_baseline": round((1.0 / per_desc)
                                 / (cfg.scene_key_capacity / 0.05), 3),
        }))

    if ONLY in ("", "fpfh"):
        # the reference's SECOND flagship driver: FPFH_demo.cpp — the same
        # segmentation-first chain with FPFH-33 at the REFERENCE'S OWN
        # parameterization: r=0.15 descriptors computed over the keypoint
        # cloud itself (FPFH_demo.cpp:423-428 sets the VoxelGrid keypoints
        # as input with no setSearchSurface) and the 2-NN ratio gate
        # (:531-532, τ = d1/d2 ≤ 1) instead of SHOT's absolute gate. Same
        # raw frame, same lattice front end, same BOARD voting frames.
        from tpu_joints.modelbank import build_bank

        fpfh_cfg = dataclasses.replace(
            cfg, descriptor="fpfh", match_mode="ratio", ratio=1.0,
            descr_rad=0.15,                     # FPFH_demo.cpp:511
            # FPFH keeps the 4-iteration tier-1 view budget: its ratio-
            # gated matches start candidates farther out than SHOT's, and
            # at 3 iterations the ranking picked a 180° flip (rejected by
            # the coverage gate — acc=False; scripts/exp_fpfh_accuracy.py)
            tier1_view_iterations=4,
            fpfh_surface="keys", fpfh_k_max=192)
        fpfh_bank = build_bank(
            _joint_model(), descriptor="fpfh",
            descr_radius=fpfh_cfg.descr_rad, rf_radius=fpfh_cfg.rf_rad,
            rf_k_max=fpfh_cfg.rf_k_max, frames=fpfh_cfg.rf_frames,
            sampling_radius=fpfh_cfg.model_ss, normal_k=fpfh_cfg.normal_k,
            k_max=fpfh_cfg.k_max, fpfh_surface="keys", fpfh_k_max=192,
            level=0 if SMALL else 1,
            resolution=64 if SMALL else 128, surface_leaf=0.01,
            key_capacity=64 if SMALL else 256,
            icp_capacity=1024 if SMALL else 2048)

        def run_fpfh():
            return detect_organized(
                seg_img, seg_valid, fpfh_bank, fpfh_cfg, block=block,
                half_window=half_window, crop_lo=crop_lo, crop_hi=crop_hi,
                fused=fused)

        timed(run_fpfh, "scene_latency_fpfh", poses=fpfh_bank.poses)

    if ONLY in ("", "sweep"):
        # robustness acceptance: pose×noise draws through the DEFAULT
        # chain over TWO joint geometries (the sweep reuses the compiled
        # executables — the diagonal joint shares every static shape;
        # only the bank arrays and the host raycast differ per draw)
        geometries = [("joint30", run, SWEEP, None)]
        if not SMALL:
            from tpu_joints.modelbank import build_bank as _bb

            bank_diag = _bb(
                _joint_model_diag(), descriptor=cfg.descriptor,
                descr_radius=cfg.descr_rad, rf_radius=cfg.rf_rad,
                rf_k_max=cfg.rf_k_max, frames=cfg.rf_frames,
                sampling_radius=cfg.model_ss, normal_k=cfg.normal_k,
                k_max=cfg.k_max, level=1, resolution=128,
                surface_leaf=0.01, key_capacity=256, icp_capacity=2048)

            def run_diag(img, vmask):
                return detect_organized(
                    img, vmask, bank_diag, det_cfg, block=block,
                    half_window=half_window, crop_lo=crop_lo,
                    crop_hi=crop_hi, fused=fused)

            geometries.append(("joint45", run_diag, SWEEP_DIAG,
                               _CYLINDERS_DIAG))

        for geom, runner, grid, cyls in geometries:
            errs = []
            for T_i, seed, must in (grid[:2] if SMALL else grid):
                img_h, v_h = _frame(T_i, seed, with_table=False,
                                    cylinders=cyls)
                res, _ = runner(jnp.asarray(img_h), jnp.asarray(v_h))
                jax.block_until_ready(res.full_pose)
                rot, trans = _err(np.asarray(res.full_pose), T_i)
                adde = _add_err(np.asarray(res.full_pose), T_i, geom)
                errs.append((rot, trans, bool(res.accepted), adde, must))
                if os.environ.get("BENCH_DEBUG"):
                    from tpu_joints.core.transforms import compose as _compose
                    gposes = (bank.poses if geom == "joint30"
                              else bank_diag.poses)
                    full = np.asarray(jax.vmap(_compose)(
                        res.cand_poses, gposes[res.cand_views]))
                    cov = np.asarray(res.metrics.get(
                        "cand_coverage", np.zeros(full.shape[0])))
                    unex = np.asarray(res.metrics.get(
                        "cand_unexplained", np.zeros(full.shape[0])))
                    print(f"# sweep {geom} seed={seed}: rot={rot:.2f} "
                          f"trans={trans*1000:.1f} acc={bool(res.accepted)} "
                          f"ffit={float(res.full_fitness):.3e} "
                          f"cov="
                          f"{float(res.metrics.get('best_coverage', 0)):.3e}",
                          file=sys.stderr)
                    for c in range(full.shape[0]):
                        r, t_ = _err(full[c], T_i)
                        print(f"#   cand{c:2d} "
                              f"view={int(res.cand_views[c]):2d} "
                              f"valid={bool(res.cand_valid[c])} "
                              f"fit={float(res.cand_fitness[c]):.3e} "
                              f"cov={float(cov[c]):.3e} "
                              f"unex={float(unex[c]):.3f} "
                              f"rot={r:7.2f} trans={t_ * 1000:7.1f}",
                              file=sys.stderr)
            rots = [e[0] for e in errs]
            trs = [e[1] for e in errs]
            adds = [e[3] for e in errs]
            n_acc = sum(e[2] for e in errs)
            must_ok = all(e[2] and e[0] < 2.0 and e[1] < 0.010
                          for e in errs if e[4])
            no_accepted_wrong = all(e[0] < 5.0 and e[1] < 0.020
                                    for e in errs if e[2])
            print(
                f"# sweep[{geom}]: {len(errs)} pose×noise draws, "
                f"accepted={n_acc}/{len(errs)} must_detect_ok={must_ok} "
                f"no_accepted_wrong={no_accepted_wrong} "
                f"rot_err=[{min(rots):.2f},{max(rots):.2f}]deg "
                f"trans_err=[{min(trs)*1000:.1f},{max(trs)*1000:.1f}]mm "
                f"add=[{min(adds)*1000:.1f},{max(adds)*1000:.1f}]mm",
                file=sys.stderr,
            )
            # SMALL is script smoke-validation only: the shrunken bank (12
            # views at resolution 64) leaves pose margins thin enough that
            # fp-level compile differences flip marginal candidates — the
            # full-size run is the acceptance gate
            assert (must_ok and no_accepted_wrong) or SMALL, (
                f"sweep[{geom}] failure: {errs}")

    if ONLY in ("", "sweep", "instances"):
        # TWO-INSTANCE scene (the hypothesis driver's whole point:
        # SHOT_hypothesis.cpp:653-721 prints a GOOD verdict per surviving
        # registered instance). Two posed copies of the joint in one
        # frame; good_instances must return exactly 2 accurate poses and
        # nothing spurious. The coverage ACCEPTANCE gate runs in LOCAL
        # mode (config.coverage_local): globally one instance cannot
        # explain the other's points, but each candidate must still
        # explain its OWN footprint. Coverage RANKING stays global: the
        # other instance's contribution is a constant offset shared by
        # every candidate, so the true-vs-flip contrast is preserved.
        from tpu_joints.pipelines.detect import good_instances

        # SEPARATED instances (round-5 root cause of the r4 rc=1): the
        # r4 poses ([-0.26,-0.02,1.05] / [0.28,0.06,1.00] at these
        # rotations) made the two chords meet tip-to-tip — measured MIN
        # SURFACE GAP 0.000 m, 24% of joint a within 0.2 m of joint b —
        # i.e. one interpenetrating tube sculpture, not a two-instance
        # scene. Descriptors whose 60 mm support straddles both surfaces
        # lose the rotational phase (every Hough init was 50–180° off)
        # and the 0.2 m ICP basin slid candidates into the junction. The
        # reference's multi-object scenes are SEPARATE objects on a bench
        # (Results/*.png); these poses keep a 0.25 m surface gap with
        # single-frame-grade visibility per joint (~34k px, >2.2k stub px
        # each vs 37k/2.8k single).
        T_a = _pose(25.0, -15.0, [-0.30, -0.16, 1.05])
        T_b = _pose(-20.0, 20.0, [0.30, 0.18, 1.00])
        cyls2 = []
        for T in (T_a, T_b):
            for c0, a0, r0, h0 in _CYLINDERS:
                cyls2.append((T[:3, :3] @ c0 + T[:3, 3], T[:3, :3] @ a0,
                              r0, h0))
        img2_h, v2_h = _frame(np.eye(4, dtype=np.float32), 77,
                              with_table=False, cylinders=cyls2)
        multi_cfg = dataclasses.replace(
            det_cfg,
            # the coverage gate stays ON but turns LOCAL: the global
            # unexplained fraction is ~50% at any pose (the other
            # instance), while per-footprint it keeps single-instance
            # semantics — measured on this frame: true poses 0.000,
            # 180°-flips 0.12-0.15, so 0.02 rejects flips with 6x margin
            coverage_local=True,
            # TWO physical instances need TWO translation peaks per view;
            # with split_rotation_modes each peak emits its two rotation
            # modes -> 4 instances/view. The cut is PEAK-grouped (top 16
            # (view, peak) pairs x both modes): the r4 view-grouped cut
            # kept only 4 whole views and the vote-richer joint starved
            # the other out of the field (debug_multi_instance.py: kept
            # views [2,16,17,18], all a-dominated). 16 pairs because the
            # true-rotation peaks of the flip-dominated joint rank
            # 18th-26th by votes on this frame (flip peaks carry ~20
            # votes, true-rotation peaks ~13-14, coherent phase-aliased
            # spam 13-16 — a 24-pair cut admits the true peaks; the
            # coverage ranking then arbitrates). refine_top=12 keeps
            # tier-2 budget for both joints despite ~10 of the kept
            # pairs converging to duplicates of the stronger joint.
            max_instances_per_view=4,
            peak_grouped_candidates=True,
            max_candidates=48,
            refine_top=12,
            # the verdict scene is correctness-gated, not latency-gated:
            # keep the full 4-iteration tier-1 view budget it passed with
            tier1_view_iterations=4,
            # NO Pallas in the verdict config: its scene capacity (8192
            # lanes vs the serving chains' 2560) would make every ICP NN
            # a SECOND Mosaic program shape in the process, and
            # re-executing the serving programs afterwards trips the TPU
            # runtime's re-execution fault (docs/PERFORMANCE.md — the r5
            # full-bench run crashed exactly there; BENCH_ONLY=instances
            # in its own process masked it). The XLA top-k path adds no
            # Mosaic program, needs no sequential row capping
            # (icp_rows_per_call stays 0 — one 48x512 scan), and this
            # section is correctness-gated, not latency-gated.
            icp_allow_pallas=False,
            scene_capacity=4096 if SMALL else 8192,
            scene_key_capacity=512 if SMALL else 1024,
        )
        wide_lo = jnp.array([-0.8, -0.6, 0.5], jnp.float32)
        wide_hi = jnp.array([0.8, 0.6, 1.7], jnp.float32)
        res_m, n_sel_m = detect_organized(
            jnp.asarray(img2_h), jnp.asarray(v2_h), bank, multi_cfg,
            block=block, half_window=half_window,
            crop_lo=wide_lo, crop_hi=wide_hi, fused=fused)
        jax.block_until_ready(res_m.full_pose)
        inst = good_instances(res_m, multi_cfg, min_separation=0.2)
        inst_errs = []
        covered = set()
        for k in inst:
            e = {n: _err(k["pose"], T)
                 for n, T in (("a", T_a), ("b", T_b))}
            name, (ang, dt) = min(e.items(), key=lambda kv: kv[1][1])
            inst_errs.append((name, ang, dt))
            covered.add(name)
        instances_ok = (
            len(inst) == 2 and covered == {"a", "b"}
            and all(ang < 1.0 and dt < 0.005 for _, ang, dt in inst_errs))
        print(f"# multi_instance: instances_ok={instances_ok} "
              f"n_good={len(inst)} working_set={int(n_sel_m)} errs=" +
              " ".join(f"{n}:{ang:.2f}deg/{dt*1000:.1f}mm"
                       for n, ang, dt in inst_errs),
              file=sys.stderr)
        if os.environ.get("BENCH_DEBUG"):
            ffit = np.asarray(res_m.metrics["cand_full_fitness"])
            t2 = np.asarray(res_m.metrics["cand_tier2"])
            poses_m = np.asarray(res_m.metrics["cand_full_poses"])
            for c in range(poses_m.shape[0]):
                ea = _err(poses_m[c], T_a)
                eb = _err(poses_m[c], T_b)
                print(f"#   cand{c:2d} view={int(res_m.cand_views[c]):2d} "
                      f"valid={bool(res_m.cand_valid[c])} t2={bool(t2[c])} "
                      f"ffit={ffit[c]:.3e} "
                      f"a={ea[0]:6.1f}/{ea[1]*1000:6.1f} "
                      f"b={eb[0]:6.1f}/{eb[1]*1000:6.1f}", file=sys.stderr)
        assert instances_ok or SMALL, (
            f"multi-instance failure: {len(inst)} instances, {inst_errs}")

        # GO-HV ON, same scene (SHOT_hypothesis.cpp:632-651): the global
        # hypothesis verification arbitrates the registered candidate
        # field jointly — the GOOD verdicts must still cover both joints
        # and nothing spurious. Timed against the HV-off run above so the
        # artifact records HV's full-scale latency cost.
        def run_multi(cfg_m):
            r, n = detect_organized(
                jnp.asarray(img2_h), jnp.asarray(v2_h), bank, cfg_m,
                block=block, half_window=half_window,
                crop_lo=wide_lo, crop_hi=wide_hi, fused=fused)
            jax.block_until_ready(r.full_pose)
            return r

        hv_cfg = dataclasses.replace(
            multi_cfg, hv_enabled=True, hv_inlier_threshold=0.01)
        res_hv = run_multi(hv_cfg)

        def med_ms(cfg_m, n=5):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                run_multi(cfg_m)
                ts.append((time.perf_counter() - t0) * 1000.0)
            return float(np.median(ts))

        ms_off, ms_on = med_ms(multi_cfg), med_ms(hv_cfg)
        inst_hv = good_instances(res_hv, hv_cfg, min_separation=0.2)
        hv_errs = []
        hv_covered = set()
        for k in inst_hv:
            e = {n: _err(k["pose"], T)
                 for n, T in (("a", T_a), ("b", T_b))}
            name, (ang, dt) = min(e.items(), key=lambda kv: kv[1][1])
            hv_errs.append((name, ang, dt))
            hv_covered.add(name)
        hv_ok = (
            len(inst_hv) == 2 and hv_covered == {"a", "b"}
            and all(ang < 1.0 and dt < 0.005 for _, ang, dt in hv_errs))
        n_verified = int(np.asarray(res_hv.cand_verified).sum())
        print(f"# multi_instance_hv: hv_ok={hv_ok} n_good={len(inst_hv)} "
              f"verified_mask={n_verified}/{res_hv.cand_verified.shape[0]} "
              f"latency_hv_on={ms_on:.1f}ms hv_off={ms_off:.1f}ms errs=" +
              " ".join(f"{n}:{ang:.2f}deg/{dt*1000:.1f}mm"
                       for n, ang, dt in hv_errs),
              file=sys.stderr)
        assert hv_ok or SMALL, (
            f"multi-instance HV failure: {len(inst_hv)}, {hv_errs}")


if __name__ == "__main__":
    main()
