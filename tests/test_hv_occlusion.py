"""HV occlusion semantics (VERDICT item 6; ``SHOT_hypothesis.cpp:56-64``).

PCL's GlobalHypothesesVerification only counts *visible* model points as
potential outliers: a model point hidden behind the scene surface (its
depth exceeds the sensor depth at that pixel by ``occlusion_thres``, the
reference sets 0.001) is exempt. Without that reasoning, a full-model
hypothesis at the TRUE pose drowns in false outliers — its self-occluded
back side has no scene support — and naive counting rejects it.
"""
import numpy as np
import jax.numpy as jnp

from tpu_joints.core.cloud import make_cloud
from tpu_joints.recognize.hv import scene_depth_buffer, verify_hypotheses


def _cylinder(rng, n=800, r=0.06, half=0.2, z0=1.0):
    """Camera-frame cylinder (axis along x) centered at z=z0."""
    th = rng.uniform(0, 2 * np.pi, n)
    x = rng.uniform(-half, half, n)
    return np.stack([x, r * np.cos(th), r * np.sin(th) + z0], 1).astype(
        np.float32)


def test_depth_buffer_front_surface(rng):
    pts = _cylinder(rng)
    scene = make_cloud(pts[pts[:, 2] < 1.0], capacity=1024)
    depth, lo, scale = scene_depth_buffer(scene, bins=64)
    d = np.asarray(depth)
    filled = d[d < 1e38]
    assert filled.size > 50
    # the front surface of a r=0.06 cylinder at z=1 spans z ∈ [0.94, 1.0]
    assert filled.min() > 0.9 and filled.max() < 1.01


def test_occlusion_rescues_true_full_model_hypothesis(rng):
    """The VERDICT scenario: naive outlier counting rejects the true
    hypothesis (its self-occluded back side looks like outliers); with the
    reference's occlusion threshold it is accepted."""
    model = _cylinder(rng)                 # full cylinder at the true pose
    front = model[model[:, 2] < 1.0]       # what the camera actually sees
    scene = make_cloud(front, capacity=1024)

    H, Nm = 1, model.shape[0]
    inst_xyz = jnp.asarray(model[None])    # registered at the true pose
    inst_mask = jnp.ones((H, Nm), bool)
    valid = jnp.ones((H,), bool)

    # PCL-magnitude regularizer so outliers actually matter (the reference's
    # 0.001 makes them nearly free, which would mask the distinction)
    naive = verify_hypotheses(
        inst_xyz, inst_mask, valid, scene,
        inlier_threshold=0.005, outlier_regularizer=3.0,
        occlusion_threshold=0.0)
    occl = verify_hypotheses(
        inst_xyz, inst_mask, valid, scene,
        inlier_threshold=0.005, outlier_regularizer=3.0,
        occlusion_threshold=0.001)
    assert not bool(naive[0]), "naive counting should reject the full model"
    assert bool(occl[0]), "occlusion reasoning should accept the true pose"


def test_occlusion_does_not_excuse_floating_hypothesis(rng):
    """A hypothesis hanging in free space gains nothing from occlusion
    reasoning — empty depth-buffer bins never exempt outliers."""
    model = _cylinder(rng)
    front = model[model[:, 2] < 1.0]
    scene = make_cloud(front, capacity=1024)
    wrong = model + np.array([0.5, 0.4, -0.3], np.float32)  # free space
    inst_xyz = jnp.asarray(wrong[None])
    inst_mask = jnp.ones((1, model.shape[0]), bool)
    valid = jnp.ones((1,), bool)
    got = verify_hypotheses(
        inst_xyz, inst_mask, valid, scene,
        inlier_threshold=0.005, outlier_regularizer=3.0,
        occlusion_threshold=0.001)
    assert not bool(got[0])
