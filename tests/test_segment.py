import numpy as np
import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import make_cloud
from tpu_joints.features import estimate_normals
from tpu_joints.segment import (
    cluster_curvature_filter,
    region_growing,
    sac_cylinder,
    sac_plane,
)

from tests.util import cylinder_points


def _two_planes(rng):
    """Two parallel planes far apart → two clusters."""
    x, y = np.meshgrid(np.linspace(0, 1, 14), np.linspace(0, 1, 14))
    a = np.stack([x.ravel(), y.ravel(), np.zeros(x.size)], 1)
    b = np.stack([x.ravel(), y.ravel(), np.full(x.size, 2.0)], 1)
    return np.concatenate([a, b]).astype(np.float32)


def test_region_growing_separates_components(rng):
    pts = _two_planes(rng)
    cloud = make_cloud(pts, capacity=512)
    normals, curv = estimate_normals(cloud, k=8, viewpoint=jnp.asarray(np.array([0, 0, 10.0], np.float32)))
    cl = region_growing(cloud, normals, curv, k=8, smoothness_deg=7.0,
                        curvature_threshold=1.0, min_cluster_size=20)
    labels = np.asarray(cl.labels)[: pts.shape[0]]
    n = pts.shape[0] // 2
    assert len(set(labels[:n])) == 1
    assert len(set(labels[n:])) == 1
    assert labels[0] != labels[n]
    assert labels.min() >= 0


def test_region_growing_respects_smoothness(rng):
    """A plane meeting a perpendicular wall splits at the crease."""
    x, y = np.meshgrid(np.linspace(0, 1, 14), np.linspace(0, 1, 14))
    floor = np.stack([x.ravel(), y.ravel(), np.zeros(x.size)], 1)
    wall = np.stack([np.full(x.size, 1.0) + 0.0 * x.ravel(), y.ravel(), x.ravel() * 0.5 + 0.05], 1)
    pts = np.concatenate([floor, wall]).astype(np.float32)
    cloud = make_cloud(pts, capacity=512)
    normals, curv = estimate_normals(cloud, k=8, viewpoint=jnp.asarray(np.array([0.5, 0.5, 10.0], np.float32)))
    cl = region_growing(cloud, normals, curv, k=8, smoothness_deg=10.0,
                        curvature_threshold=1.0, min_cluster_size=10)
    labels = np.asarray(cl.labels)[: pts.shape[0]]
    n = pts.shape[0] // 2
    # interior points of the two faces get different labels
    assert labels[5] != labels[n + 5]


def test_region_growing_min_size(rng):
    pts = _two_planes(rng)
    lone = np.array([[5.0, 5.0, 5.0]], np.float32)
    cloud = make_cloud(np.concatenate([pts, lone]), capacity=512)
    normals, curv = estimate_normals(cloud, k=8)
    cl = region_growing(cloud, normals, curv, k=8, min_cluster_size=20)
    labels = np.asarray(cl.labels)
    assert labels[pts.shape[0]] == -1  # the isolated point is discarded


def test_cluster_curvature_filter(rng):
    pts = _two_planes(rng)
    cloud = make_cloud(pts, capacity=512)
    normals, curv = estimate_normals(cloud, k=8)
    cl = region_growing(cloud, normals, curv, k=8, min_cluster_size=20)
    # give cluster B artificially high curvature
    n = pts.shape[0] // 2
    fake_curv = np.zeros(512, np.float32)
    fake_curv[n : pts.shape[0]] = 0.5
    keep = np.asarray(cluster_curvature_filter(cl, jnp.asarray(fake_curv), cloud.mask, 0.04))
    assert keep[:n].all()
    assert not keep[n : pts.shape[0]].any()


def test_sac_plane(rng):
    x, y = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
    plane = np.stack([x.ravel(), y.ravel(), 0.5 + 0 * x.ravel()], 1)
    noise = rng.uniform(-1, 1, (100, 3))
    pts = np.concatenate([plane, noise]).astype(np.float32)
    cloud = make_cloud(pts, capacity=512)
    normals, _ = estimate_normals(cloud, k=8, viewpoint=jnp.asarray(np.array([0, 0, 10.0], np.float32)))
    res = sac_plane(cloud, normals, jax.random.PRNGKey(0), n_hypotheses=128,
                    distance_threshold=0.02)
    coeff = np.asarray(res.coefficients)
    # plane z = 0.5 → n = ±(0,0,1), d = ∓0.5
    assert abs(abs(coeff[2]) - 1.0) < 1e-3
    assert abs(abs(coeff[3]) - 0.5) < 0.02
    inl = np.asarray(res.inliers)[: pts.shape[0]]
    assert inl[: plane.shape[0]].mean() > 0.95


def test_sac_cylinder(rng):
    cyl, cyl_n = cylinder_points(rng, radius=0.06, height=0.4, n=600)
    noise = rng.uniform(-0.5, 0.5, (80, 3))
    pts = np.concatenate([cyl, noise]).astype(np.float32)
    cloud = make_cloud(pts, capacity=1024)
    normals, _ = estimate_normals(cloud, k=10, viewpoint=jnp.asarray(np.array([10.0, 0, 0], np.float32)))
    res = sac_cylinder(cloud, normals, jax.random.PRNGKey(1), n_hypotheses=512,
                       distance_threshold=0.01, radius_max=0.1)
    coeff = np.asarray(res.coefficients)
    axis = coeff[3:6]
    assert abs(abs(axis[2]) - 1.0) < 0.05  # axis ≈ z
    assert abs(coeff[6] - 0.06) < 0.01  # radius
    inl = np.asarray(res.inliers)[: pts.shape[0]]
    assert inl[: cyl.shape[0]].mean() > 0.9
