"""PCL-algorithm cross-implementation golden descriptor parity.

``tests/golden/descriptors.npz`` holds frozen descriptor values for a
fixed 420-point joint cloud, produced once by
``tests/golden/gen_golden.py`` — an independent scalar-loop
re-implementation of PCL's algorithms (see its provenance docstring).
PCL itself is not installable in this environment (no egress), so this
is a two-implementation cross-check, NOT a comparison against values PCL
produced. These tests fail if ``features/shot.py`` / ``features/fpfh.py``
ever drift from those numbers.

Mirrors the reference's own golden-artifact practice: descriptor text
dumps for offline comparison (``CAD_desc.cpp:354-370``).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_joints.core.cloud import Cloud, make_cloud

_FIX = os.path.join(os.path.dirname(__file__), "golden", "descriptors.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(_FIX)


def _keypoints(g):
    xyz = g["xyz"]
    keys = xyz[g["key_idx"]]
    return make_cloud(keys, capacity=16), jnp.asarray(xyz), g


def test_shot_matches_golden(golden):
    from tpu_joints.features.shot import compute_shot

    keys, _, g = _keypoints(golden)
    surface = make_cloud(g["xyz"], capacity=512)
    desc, rf, valid = compute_shot(
        keys, surface, jnp.asarray(np.pad(g["normals"],
                                          ((0, 512 - g["xyz"].shape[0]), (0, 0)))),
        radius=float(g["radius_shot"]), k_max=256, scheme="pcl")
    n = g["key_idx"].shape[0]
    assert bool(np.asarray(valid)[:n].all())
    got = np.asarray(desc)[:n]
    want = g["shot"]
    # tight tolerance: float32 accumulation order differs (einsum vs
    # scalar loop), nothing else should
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_shot_lrf_matches_golden(golden):
    from tpu_joints.features.lrf import shot_lrf
    from tpu_joints.neighbors import radius_neighbors

    keys, surface_xyz, g = _keypoints(golden)
    r = float(g["radius_shot"])
    idx, within, _ = radius_neighbors(keys.xyz, surface_xyz, r, 256)
    rf, ok = shot_lrf(keys.xyz, surface_xyz[idx], within & keys.mask[:, None], r)
    n = g["key_idx"].shape[0]
    assert bool(np.asarray(ok)[:n].all())
    np.testing.assert_allclose(np.asarray(rf)[:n], g["rf"], atol=2e-4)


def test_fpfh_matches_golden(golden):
    from tpu_joints.features.fpfh import compute_fpfh

    keys, _, g = _keypoints(golden)
    surface = make_cloud(g["xyz"], capacity=512)
    normals = jnp.asarray(np.pad(g["normals"],
                                 ((0, 512 - g["xyz"].shape[0]), (0, 0))))
    n = g["key_idx"].shape[0]
    key_normals = jnp.asarray(g["normals"][g["key_idx"]])
    key_normals = jnp.pad(key_normals, ((0, 16 - n), (0, 0)))
    desc, valid = compute_fpfh(keys, key_normals, surface, normals,
                               radius=float(g["radius_fpfh"]), k_max=256)
    assert bool(np.asarray(valid)[:n].all())
    got = np.asarray(desc)[:n]
    # blocks sum to 100 → absolute tolerance on that scale
    np.testing.assert_allclose(got, g["fpfh"], atol=2e-3)


def test_fixture_provenance_regenerable():
    """The committed fixture must be exactly what gen_golden.py produces
    (catches silent edits to either side)."""
    import tests.golden.gen_golden as gg

    xyz, key_idx = gg.fixture_cloud()
    g = np.load(_FIX)
    np.testing.assert_array_equal(xyz, g["xyz"])
    np.testing.assert_array_equal(key_idx, g["key_idx"])
    # spot-check one keypoint end to end (full regen is ~20 s; one key is
    # plenty to pin the generator's algorithm)
    normals = g["normals"]
    p = xyz[key_idx[0]]
    d = np.linalg.norm(xyz - p, axis=1)
    sel = (d <= gg.RADIUS_SHOT) & (d > 1e-9)
    rf = gg.shot_lrf_np(p, xyz[sel], gg.RADIUS_SHOT)
    s = gg.shot_np(p, rf, xyz[sel], normals[sel], gg.RADIUS_SHOT)
    np.testing.assert_allclose(s, g["shot"][0], atol=1e-6)
