"""Anchor-propagated normals vs exact normals (features.normals fast path)."""
import numpy as np

from tpu_joints.core.cloud import make_cloud
from tpu_joints.features.normals import estimate_normals, estimate_normals_anchored

from tests.util import cylinder_points


def test_anchored_close_to_exact(rng):
    xyz, true_n = cylinder_points(rng, radius=0.08, height=0.5, n=4000)
    cloud = make_cloud(xyz, capacity=4096)
    n_exact, c_exact = estimate_normals(cloud, k=16)
    n_anch, c_anch = estimate_normals_anchored(cloud, k=16, anchors=1024)
    mask = np.asarray(cloud.mask)
    ne, na = np.asarray(n_exact)[mask], np.asarray(n_anch)[mask]
    # anchor propagation smooths: compare angles, allow a few degrees
    dots = np.abs(np.sum(ne * na, axis=1))
    assert np.median(dots) > 0.999
    assert np.quantile(dots, 0.05) > 0.98
    # both should agree with the analytic cylinder normal
    tn = np.asarray(true_n)[mask[: len(true_n)]]
    agree = np.abs(np.sum(na[: len(tn)] * tn, axis=1))
    assert np.median(agree) > 0.99


def test_anchored_equals_exact_when_anchors_cover(rng):
    xyz, _ = cylinder_points(rng, radius=0.05, height=0.3, n=500)
    cloud = make_cloud(xyz, capacity=512)
    n1, c1 = estimate_normals(cloud, k=10)
    n2, c2 = estimate_normals_anchored(cloud, k=10, anchors=512)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
