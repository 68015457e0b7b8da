"""Golden end-to-end test (SURVEY.md §4): synthetic joint CAD → virtual
scanner bank → rendered scene at a known pose → full detect() →
< 1° rotation / < 5 mm translation (BASELINE.md tolerance)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import make_cloud
from tpu_joints.core import transforms as tr
from tpu_joints.modelbank import build_bank, render_views, save_bank, load_bank
from tpu_joints.pipelines import detect

from tests.util import joint_points, random_rotation

CFG = DetectionConfig(
    descriptor="shot",
    descr_rad=0.12,
    model_ss=0.03,
    scene_ss=0.03,
    normal_k=12,
    match_mode="nn",
    match_threshold=0.25,
    algorithm="hough",
    cg_size=0.05,
    cg_thresh=3.0,
    icp_iterations=20,
    max_candidates=4,
    accept_fitness=0.001,
    scene_capacity=4096,
    scene_key_capacity=256,
    k_max=96,
)


def _make_problem(rng, seed_T=0):
    model_xyz, _ = joint_points(rng, n_chord=1200, n_stub=700, jitter=0.0)
    rngT = np.random.default_rng(seed_T)
    T_world = np.eye(4, dtype=np.float32)
    T_world[:3, :3] = random_rotation(rngT)
    T_world[:3, 3] = rngT.uniform(-0.3, 0.3, 3).astype(np.float32)
    moved = model_xyz @ T_world[:3, :3].T + T_world[:3, 3]
    views, poses, entropies = render_views(moved, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    scene_xyz = views[v]
    T_gt = poses[v] @ T_world  # CAD model frame → scene(camera) frame
    return model_xyz, scene_xyz, T_gt



@pytest.fixture(scope="module")
def problem():
    """Shared (model, scene, T_gt, bank) — three tests here run the same
    problem under different configs, and the bank build dominates setup."""
    rng = np.random.default_rng(0)
    model_xyz, scene_xyz, T_gt = _make_problem(rng)
    bank = build_bank(
        model_xyz, descriptor=CFG.descriptor, descr_radius=CFG.descr_rad,
        sampling_radius=CFG.model_ss, normal_k=CFG.normal_k, k_max=CFG.k_max,
        level=0, resolution=96, key_capacity=128,
    )
    return model_xyz, scene_xyz, T_gt, bank


def test_detect_recovers_pose(problem):
    model_xyz, scene_xyz, T_gt, bank = problem
    scene = make_cloud(scene_xyz, capacity=CFG.scene_capacity)
    res = detect(scene, bank, CFG)
    fit = float(res.fitness)
    T_est = np.asarray(res.full_pose)
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_gt[:3, :3]),
                                         jnp.asarray(T_est[:3, :3])))
    terr = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    assert bool(res.accepted), f"fitness={fit}, metrics={jnp_metrics(res)}"
    assert ang < 1.0, f"rotation error {ang}° (fitness {fit})"
    assert terr < 0.005, f"translation error {terr*1000:.1f} mm"


def jnp_metrics(res):
    return {k: np.asarray(v).item() for k, v in res.metrics.items()}


def test_final_full_cad_icp_polish(problem):
    """SHOT_demo.cpp:641-686: composed-pose ICP on the full CAD + the
    score2 < 0.006 gate tightens (or preserves) the recovered pose."""
    import dataclasses

    model_xyz, scene_xyz, T_gt, bank = problem
    cfg = dataclasses.replace(CFG, final_icp_iterations=3)
    scene = make_cloud(scene_xyz, capacity=cfg.scene_capacity)
    res = detect(scene, bank, cfg)
    assert bool(res.accepted)
    assert float(res.full_fitness) < 0.006  # the reference's score2 gate
    T_est = np.asarray(res.full_pose)
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_gt[:3, :3]),
                                         jnp.asarray(T_est[:3, :3])))
    terr = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    assert ang < 1.0 and terr < 0.005


def test_bank_roundtrip(tmp_path, rng):
    model_xyz, _ = joint_points(rng, n_chord=400, n_stub=200)
    bank = build_bank(model_xyz, level=0, resolution=64, key_capacity=64,
                      descr_radius=0.1, sampling_radius=0.05, normal_k=10, k_max=48)
    p = str(tmp_path / "bank.npz")
    save_bank(p, bank)
    back = load_bank(p)
    np.testing.assert_array_equal(np.asarray(back.desc), np.asarray(bank.desc))
    np.testing.assert_array_equal(np.asarray(back.poses), np.asarray(bank.poses))
    assert back.params_hash == bank.params_hash


def test_scanner_42_views(rng):
    from tpu_joints.modelbank import icosphere_vertices

    assert icosphere_vertices(0).shape == (12, 3)
    assert icosphere_vertices(1).shape == (42, 3)  # reference render.cpp:33-35
    model_xyz, _ = joint_points(rng, n_chord=300, n_stub=150)
    views, poses, entropies = render_views(model_xyz, level=1, resolution=64)
    assert len(views) == 42 and poses.shape == (42, 4, 4)
    assert all(v.shape[0] > 0 for v in views)
    # every view pose is rigid and puts the model in front of the camera
    for T, v in zip(poses[:5], views[:5]):
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert v[:, 2].min() > 0


def test_two_tier_refinement_matches_single_tier(problem):
    """cfg.refine_top: the two-tier pass (tier-1 rank at reduced rows →
    full polish on the survivors) must recover the same pose as the
    single-tier compute-all path within the golden tolerances."""
    import dataclasses

    model_xyz, scene_xyz, T_gt, bank = problem
    cfg = dataclasses.replace(CFG, final_icp_iterations=3, max_candidates=4)
    scene = make_cloud(scene_xyz, capacity=cfg.scene_capacity)
    cfg2 = dataclasses.replace(cfg, refine_top=2, tier1_rows=256)
    res1 = detect(scene, bank, cfg)
    res2 = detect(scene, bank, cfg2)
    assert bool(res1.accepted) and bool(res2.accepted)
    for res in (res1, res2):
        T_est = np.asarray(res.full_pose)
        ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_gt[:3, :3]),
                                             jnp.asarray(T_est[:3, :3])))
        terr = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
        assert ang < 1.0 and terr < 0.005
    # the two estimates agree with each other (tier-2 runs the identical
    # polish the single-tier path runs on the same winner)
    dang = float(tr.rotation_geodesic_deg(
        jnp.asarray(np.asarray(res1.full_pose)[:3, :3]),
        jnp.asarray(np.asarray(res2.full_pose)[:3, :3])))
    assert dang < 0.5
