import numpy as np
import jax.numpy as jnp

from tpu_joints.core.cloud import make_cloud
from tpu_joints.features.eigen3 import eigh3x3, eigvals3x3, smallest_eigenvector
from tpu_joints.features.normals import estimate_normals, estimate_normals_radius


def _random_sym(rng, n):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


def test_eigvals_match_numpy(rng):
    A = _random_sym(rng, 50)
    vals = np.asarray(eigvals3x3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)[:, ::-1]
    np.testing.assert_allclose(vals, ref, atol=1e-4)


def test_eigvecs_are_eigvecs(rng):
    A = _random_sym(rng, 50)
    vals, vecs = eigh3x3(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    for i in range(50):
        for j in range(3):
            v = vecs[i][:, j]
            np.testing.assert_allclose(A[i] @ v, vals[i, j] * v, atol=2e-3)
        # right-handed orthonormal
        np.testing.assert_allclose(vecs[i].T @ vecs[i], np.eye(3), atol=1e-4)
        assert np.linalg.det(vecs[i]) > 0.9


def test_eig_degenerate_plane():
    # plane covariance: two equal large eigenvalues, one zero
    A = np.diag([1.0, 1.0, 0.0]).astype(np.float32)[None]
    v, vals = smallest_eigenvector(jnp.asarray(A))
    np.testing.assert_allclose(np.abs(np.asarray(v)[0]), [0, 0, 1], atol=1e-4)


def test_eig_degenerate_line():
    # line covariance: one large, two zero
    A = np.diag([1.0, 0.0, 0.0]).astype(np.float32)[None]
    vals, vecs = eigh3x3(jnp.asarray(A))
    v0 = np.asarray(vecs)[0][:, 0]
    np.testing.assert_allclose(np.abs(v0), [1, 0, 0], atol=1e-4)
    # smallest eigenvector must be orthogonal to the line
    v2 = np.asarray(vecs)[0][:, 2]
    assert abs(v2 @ np.array([1.0, 0, 0])) < 1e-4


def test_eig_isotropic():
    A = np.eye(3, dtype=np.float32)[None] * 2.0
    vals, vecs = eigh3x3(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(vals)[0], [2, 2, 2], atol=1e-5)
    V = np.asarray(vecs)[0]
    np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-4)


def test_normals_plane(rng):
    x, y = np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 12))
    pts = np.stack([x.ravel(), y.ravel(), np.full(x.size, 2.0)], 1).astype(np.float32)
    c = make_cloud(pts)
    n, curv = estimate_normals(c, k=8)
    n, curv = np.asarray(n), np.asarray(curv)
    m = np.asarray(c.mask)
    # normal ±z, oriented toward origin viewpoint (below plane) → -z... origin is at z=0, plane at z=2, so normal points toward origin = -z
    np.testing.assert_allclose(n[m], np.tile([0, 0, -1.0], (m.sum(), 1)), atol=1e-3)
    assert np.all(curv[m] < 1e-5)


def test_normals_sphere(rng):
    u = rng.normal(size=(400, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = (u * 1.0 + np.array([5.0, 0, 0])).astype(np.float32)
    c = make_cloud(pts)
    n, curv = estimate_normals(c, k=12, viewpoint=jnp.asarray(np.array([5.0, 0, 0], np.float32)))
    n = np.asarray(n)
    m = np.asarray(c.mask)
    # normals should be radial, oriented inward (toward center viewpoint)
    dots = np.abs(np.sum(n[m] * u, axis=1))
    assert np.mean(dots) > 0.98


def test_normals_radius_mode(rng):
    x, y = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 10))
    pts = np.stack([x.ravel(), y.ravel(), np.zeros(x.size)], 1).astype(np.float32)
    c = make_cloud(pts)
    n, curv = estimate_normals_radius(c, radius=0.3, k_max=16,
                                      viewpoint=jnp.asarray(np.array([0, 0, 10.0], np.float32)))
    n = np.asarray(n)
    m = np.asarray(c.mask)
    np.testing.assert_allclose(n[m], np.tile([0, 0, 1.0], (m.sum(), 1)), atol=1e-3)
