import numpy as np
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud, SENTINEL, bucket_size, make_cloud, pad_cloud, to_numpy
from tpu_joints.core import transforms as tr
from tpu_joints.core import io as tio
from tpu_joints.core import posefile


def _random_rigid(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Q
    T[:3, 3] = rng.normal(size=3)
    return T


def test_make_cloud_pads_and_drops_nan(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts[7] = np.nan
    c = make_cloud(pts)
    assert c.capacity == 256
    assert int(np.sum(np.asarray(c.mask))) == 99
    assert np.all(np.asarray(c.xyz)[np.asarray(c.mask) == 0] == SENTINEL)
    assert to_numpy(c).shape == (99, 3)


def test_bucket_size():
    assert bucket_size(1) == 256
    assert bucket_size(257) == 512
    assert bucket_size(256) == 256


def test_pad_cloud(rng):
    c = make_cloud(rng.normal(size=(10, 3)))
    c2 = pad_cloud(c, 512)
    assert c2.capacity == 512
    assert int(c2.count()) == 10


def test_transform_roundtrip(rng):
    T = _random_rigid(rng)
    c = make_cloud(rng.normal(size=(50, 3)))
    c2 = tr.transform_cloud(tr.transform_cloud(c, jnp.asarray(T)), jnp.asarray(tr.invert_rigid(jnp.asarray(T))))
    np.testing.assert_allclose(to_numpy(c2), to_numpy(c), atol=1e-4)


def test_centroid_covariance_ignores_padding(rng):
    pts = rng.normal(size=(37, 3)).astype(np.float32)
    c = make_cloud(pts, capacity=128)
    cen = np.asarray(tr.masked_centroid(c.xyz, c.mask))
    np.testing.assert_allclose(cen, pts.mean(0), atol=1e-5)
    cov = np.asarray(tr.masked_covariance(c.xyz, c.mask))
    d = pts - pts.mean(0)
    np.testing.assert_allclose(cov, d.T @ d / 37, atol=1e-5)


def test_umeyama_recovers_pose(rng):
    T = _random_rigid(rng)
    src = rng.normal(size=(40, 3)).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    w = np.ones(40, np.float32)
    Te = np.asarray(tr.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(Te, T, atol=1e-4)


def test_umeyama_respects_weights(rng):
    T = _random_rigid(rng)
    src = rng.normal(size=(40, 3)).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    dst[30:] += 100.0  # corrupted pairs get zero weight
    w = np.concatenate([np.ones(30), np.zeros(10)]).astype(np.float32)
    Te = np.asarray(tr.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(Te, T, atol=1e-4)


def test_quaternion_euler_roundtrip(rng):
    for _ in range(5):
        T = _random_rigid(rng)
        q = tr.rotation_from_matrix_to_quaternion(jnp.asarray(T[:3, :3]))
        # rebuild rotation from quaternion, compare geodesic
        w, x, y, z = np.asarray(q)
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        ang = float(tr.rotation_geodesic_deg(jnp.asarray(T[:3, :3]), jnp.asarray(R, dtype=jnp.float32)))
        assert ang < 0.1


def test_fold_euler():
    e = jnp.array([2.0, -2.0, 0.3])
    out = np.asarray(tr.fold_euler_90(e))
    assert np.all(np.abs(out) <= np.pi / 2 + 1e-6)


def test_pcd_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = rng.uniform(size=(20, 3)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"a_{binary}.pcd")
        tio.save_pcd(p, tio.PointData(xyz=xyz, rgb=rgb), binary=binary)
        back = tio.load_pcd(p)
        np.testing.assert_allclose(back.xyz, xyz, atol=1e-4)
        np.testing.assert_allclose(back.rgb, rgb, atol=1 / 255.0 + 1e-6)


def test_ply_ascii(tmp_path):
    ply = (
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
    )
    p = tmp_path / "t.ply"
    p.write_bytes(ply.encode())
    data, faces = tio.load_ply(str(p))
    assert data.xyz.shape == (3, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2]])


def test_pose_file_roundtrip(tmp_path, rng):
    poses = np.stack([_random_rigid(rng) for _ in range(4)])
    p = str(tmp_path / "pose.txt")
    posefile.save_pose_file(p, poses)
    back = posefile.load_pose_file(p)
    np.testing.assert_allclose(back, poses, atol=1e-6)
