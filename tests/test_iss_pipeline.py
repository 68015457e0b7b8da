"""ISS keypoints as the pipeline's detector (SURVEY.md A13 parity)."""
import dataclasses

import numpy as np

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import make_cloud
from tpu_joints.modelbank import build_bank, render_views
from tpu_joints.pipelines import detect

from tests.util import joint_points

CFG = DetectionConfig(
    descriptor="shot", descr_rad=0.12, model_ss=0.04, scene_ss=0.04,
    normal_k=10, match_mode="nn", match_threshold=0.25,
    algorithm="hough", cg_size=0.05, cg_thresh=3.0,
    icp_iterations=15, max_candidates=2, max_instances_per_view=2,
    scene_capacity=2048, scene_key_capacity=128, k_max=48,
    keypoints="iss",
)


def test_detect_with_iss_keypoints(rng):
    model_xyz, _ = joint_points(rng, n_chord=900, n_stub=500)
    bank = build_bank(
        model_xyz, descriptor="shot", descr_radius=CFG.descr_rad,
        sampling_radius=CFG.model_ss, normal_k=CFG.normal_k, k_max=CFG.k_max,
        level=0, resolution=80, key_capacity=96,
    )
    views, poses, _ = render_views(model_xyz, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    scene = make_cloud(views[v][:2048], capacity=CFG.scene_capacity)

    res = detect(scene, bank, CFG)
    n_keys = int(np.asarray(res.metrics["scene_keypoints"]))
    assert n_keys > 0
    # ISS picks saliency keypoints — sparser than uniform sampling on the
    # mostly-smooth cylinder surfaces (only the weld intersection and rims
    # are salient)
    uni = detect(scene, bank, dataclasses.replace(CFG, keypoints="uniform"))
    assert n_keys < int(np.asarray(uni.metrics["scene_keypoints"]))
    # with so few distinctive points the pipeline must either produce a
    # finite refined pose or reject honestly — never a stale/NaN result
    if bool(res.accepted):
        assert float(res.fitness) < CFG.accept_fitness
        assert np.isfinite(np.asarray(res.full_pose)).all()
    else:
        assert np.isfinite(np.asarray(res.full_pose)).all()
    # uniform keypoints on the same scene do recover the pose
    assert float(uni.fitness) < 0.01
