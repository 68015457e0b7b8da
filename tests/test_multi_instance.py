"""Multi-instance detection (SHOT_hypothesis.cpp:653-721 analog): a scene
with TWO copies of the joint; the compute-all candidate field must surface
both, and ``good_instances`` must return exactly the two distinct GOOD
poses (flips/duplicates collapsed, nothing spurious accepted)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import make_cloud
from tpu_joints.core import transforms as tr
from tpu_joints.modelbank import build_bank
from tpu_joints.pipelines import detect, good_instances

from tests.util import knobby_joint_points, random_rotation

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
    max_candidates=8,
    max_instances_per_view=2,
    accept_fitness=0.001,
    scene_capacity=4096,
    # two full instances' worth of keypoints: at scene_ss=0.03 one joint
    # yields ~340 uniform-sampled keys, so 768 holds both at full density
    # (an undersized budget uniformly thins BOTH instances — see
    # filters.compact_indices — halving per-view Hough votes)
    scene_key_capacity=768,
    k_max=96,
)


def _pose(seed, t):
    rngT = np.random.default_rng(seed)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rngT)
    T[:3, 3] = np.asarray(t, np.float32)
    return T


@pytest.fixture(scope="module")
def problem():
    """One shared (bank, scene, T_a, T_b) for the whole module — the four
    tests pose the SAME two-instance problem under different configs, and
    the bank build is the module's dominant setup cost."""
    rng = np.random.default_rng(0)
    model_xyz, _ = knobby_joint_points(rng, n_chord=900, n_stub=500,
                                       n_knob=150, jitter=0.0)
    T_a = _pose(7, [-0.35, 0.0, 0.0])
    T_b = _pose(11, [0.35, 0.05, -0.05])
    scene_xyz = np.concatenate([
        model_xyz @ T_a[:3, :3].T + T_a[:3, 3],
        model_xyz @ T_b[:3, :3].T + T_b[:3, 3],
    ])
    bank = build_bank(
        model_xyz, descriptor=CFG.descriptor, descr_radius=CFG.descr_rad,
        sampling_radius=CFG.model_ss, normal_k=CFG.normal_k, k_max=CFG.k_max,
        level=0, resolution=96, key_capacity=192,
    )
    scene = make_cloud(scene_xyz, capacity=CFG.scene_capacity)
    return bank, scene, T_a, T_b



def test_two_instances_both_good(problem):
    bank, scene, T_a, T_b = problem

    res = detect(scene, bank, CFG)
    assert bool(res.accepted)

    inst = good_instances(res, CFG, min_separation=0.2)
    assert len(inst) == 2, f"expected 2 instances, got {len(inst)}: {inst}"

    def err(T_est, T_gt):
        ang = float(tr.rotation_geodesic_deg(
            jnp.asarray(T_gt[:3, :3]), jnp.asarray(T_est[:3, :3])))
        return ang, float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))

    # every GOOD instance must be an accurate pose of one of the two
    # ground truths, and both ground truths must be covered
    covered = set()
    for k in inst:
        errs = {name: err(k["pose"], T)
                for name, T in (("a", T_a), ("b", T_b))}
        name, (ang, dt) = min(errs.items(), key=lambda kv: kv[1][1])
        assert ang < 3.0 and dt < 0.010, (
            f"spurious instance: {ang:.1f}deg {dt*1000:.1f}mm {errs}")
        covered.add(name)
    assert covered == {"a", "b"}, f"instances cover only {covered}"


def test_two_instances_two_tier(problem):
    """Two-tier refinement × multi-instance: only tier-2 survivors are
    acceptance-grade, so ``refine_top`` must be ≥ the number of physical
    instances for all of them to be reported (the ``good_instances``
    docstring contract). refine_top=2 keeps both; refine_top=1 reports at
    most the single tier-2 winner — never a tier-1 (ranking-grade) pose."""
    import dataclasses

    bank, scene, T_a, T_b = problem

    cfg2 = dataclasses.replace(CFG, refine_top=2, final_icp_iterations=6)
    res = detect(scene, bank, cfg2)
    assert bool(res.accepted)
    inst = good_instances(res, cfg2, min_separation=0.2)
    assert len(inst) == 2, f"expected 2 instances, got {len(inst)}: {inst}"
    t_list = sorted(float(k["pose"][0, 3]) for k in inst)
    np.testing.assert_allclose(t_list, [-0.35, 0.35], atol=0.01)

    cfg1 = dataclasses.replace(CFG, refine_top=1, final_icp_iterations=6)
    res1 = detect(scene, bank, cfg1)
    inst1 = good_instances(res1, cfg1, min_separation=0.2)
    assert len(inst1) <= 1, f"tier-1 poses must not be reported: {inst1}"


def test_peak_grouped_cut_two_instances(problem):
    """Peak-grouped candidate cut (config.peak_grouped_candidates): with
    split rotation modes and 2 peaks/view (P=4), the cut ranks
    (view, peak) pairs globally so each physical instance's peaks compete
    on their own votes — both instances must be reported. With P=2 (one
    peak per view) the peak cut is BY CONSTRUCTION identical to the
    view-grouped cut; assert the equivalence on the same scene."""
    import dataclasses

    bank, scene, T_a, T_b = problem

    cfg_pk = dataclasses.replace(
        CFG, split_rotation_modes=True, peak_grouped_candidates=True,
        max_instances_per_view=4, refine_top=4, final_icp_iterations=6)
    res = detect(scene, bank, cfg_pk)
    assert bool(res.accepted)
    inst = good_instances(res, cfg_pk, min_separation=0.2)
    assert len(inst) == 2, f"expected 2 instances, got {len(inst)}: {inst}"
    t_list = sorted(float(k["pose"][0, 3]) for k in inst)
    np.testing.assert_allclose(t_list, [-0.35, 0.35], atol=0.01)

    # P=2 equivalence: one peak per view → peak pairs ARE views
    base = dict(split_rotation_modes=True, max_instances_per_view=2,
                max_candidates=8)
    res_v = detect(scene, bank, dataclasses.replace(
        CFG, view_grouped_candidates=True, **base))
    res_p = detect(scene, bank, dataclasses.replace(
        CFG, peak_grouped_candidates=True, **base))
    np.testing.assert_array_equal(np.asarray(res_v.cand_views),
                                  np.asarray(res_p.cand_views))
    np.testing.assert_allclose(np.asarray(res_v.full_pose),
                               np.asarray(res_p.full_pose), atol=1e-6)


def test_two_instances_with_hv(problem):
    """GO-HV over the multi-instance candidate field (the reference's exact
    regime, SHOT_hypothesis.cpp:632-651): the jointly-optimal subset keeps
    one verified candidate per physical instance (the multiple-assignment
    penalty kills same-spot duplicates) and good_instances reports both."""
    import dataclasses

    bank, scene, T_a, T_b = problem
    cfg = dataclasses.replace(CFG, hv_enabled=True, hv_inlier_threshold=0.01)
    res = detect(scene, bank, cfg)
    assert bool(res.accepted)
    inst = good_instances(res, cfg, min_separation=0.2)
    assert len(inst) == 2, f"expected 2 instances, got {len(inst)}: {inst}"
    t_list = sorted(float(k["pose"][0, 3]) for k in inst)
    np.testing.assert_allclose(t_list, [-0.35, 0.35], atol=0.01)
