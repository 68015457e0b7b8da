"""Cluster-tree (coarse-to-fine) search tests (SURVEY.md A29)."""
import numpy as np
import jax.numpy as jnp

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import make_cloud
from tpu_joints.core import transforms as tr
from tpu_joints.modelbank import build_bank, render_views
from tpu_joints.pipelines import detect_tree, make_view_clusters

from tests.util import joint_points, random_rotation

CFG = DetectionConfig(
    descriptor="shot", descr_rad=0.12, model_ss=0.03, scene_ss=0.03,
    normal_k=12, match_mode="nn", match_threshold=0.25,
    algorithm="hough", cg_size=0.05, cg_thresh=3.0,
    icp_iterations=20, max_candidates=4, accept_fitness=0.001,
    # 512 keys: the rendered view yields ~390 uniform samples at 0.03 —
    # an undersized budget would thin them uniformly (compact_indices),
    # and on the featureless smooth joint the thinned key set flips the
    # pose; this test's subject is the coarse-to-fine SEARCH policy, so
    # give it the full key field
    scene_capacity=4096, scene_key_capacity=512, k_max=96,
)


def test_cluster_tables(rng):
    model_xyz, _ = joint_points(rng, n_chord=400, n_stub=250)
    bank = build_bank(model_xyz, level=0, resolution=64, key_capacity=48,
                      descr_radius=0.1, sampling_radius=0.04, normal_k=10, k_max=32)
    clusters = make_view_clusters(bank, n_clusters=3)
    reps = np.asarray(clusters.representatives)
    members = np.asarray(clusters.members)
    assert reps.shape == (3,)
    assert members.shape[0] == 3
    # every one of the 12 views appears in exactly one cluster's members
    all_members = set()
    for k in range(3):
        all_members |= set(members[k].tolist())
    assert all_members == set(range(12))
    for k in range(3):
        assert reps[k] in members[k]


def test_tree_recovers_pose(rng):
    model_xyz, _ = joint_points(rng, n_chord=1200, n_stub=700, jitter=0.0)
    rngT = np.random.default_rng(0)
    T_world = np.eye(4, dtype=np.float32)
    T_world[:3, :3] = random_rotation(rngT)
    T_world[:3, 3] = rngT.uniform(-0.3, 0.3, 3).astype(np.float32)
    moved = model_xyz @ T_world[:3, :3].T + T_world[:3, 3]
    views, poses, _ = render_views(moved, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    scene_xyz, T_gt = views[v], poses[v] @ T_world

    bank = build_bank(
        model_xyz, descriptor=CFG.descriptor, descr_radius=CFG.descr_rad,
        sampling_radius=CFG.model_ss, normal_k=CFG.normal_k, k_max=CFG.k_max,
        level=0, resolution=96, key_capacity=128,
    )
    clusters = make_view_clusters(bank, n_clusters=3)
    scene = make_cloud(scene_xyz, capacity=CFG.scene_capacity)
    res = detect_tree(scene, bank, clusters, CFG)

    assert bool(res.accepted), f"fitness={float(res.fitness)}"
    T_est = np.asarray(res.full_pose)
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_gt[:3, :3]),
                                         jnp.asarray(T_est[:3, :3])))
    terr = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    assert ang < 1.0, f"rotation error {ang}°"
    assert terr < 0.005, f"translation error {terr*1000:.1f} mm"
    assert "cluster_id" in res.metrics
