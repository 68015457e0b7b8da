"""Voxel-hash grid search vs the dense oracle (SURVEY.md A5)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_joints.core.cloud import make_cloud
from tpu_joints.neighbors import radius_neighbors
from tpu_joints.neighbors.grid import build_grid, grid_radius_neighbors

from tests.util import joint_points


def _neighbor_sets(idx, valid):
    return [set(np.asarray(idx[i])[np.asarray(valid[i])].tolist())
            for i in range(idx.shape[0])]


@pytest.mark.parametrize("radius", [0.03, 0.06])
def test_grid_matches_dense_radius_search(rng, radius):
    xyz, _ = joint_points(rng, n_chord=900, n_stub=500)
    cloud = make_cloud(xyz, capacity=2048)
    rngq = np.random.default_rng(5)
    q = jnp.asarray(xyz[rngq.choice(xyz.shape[0], 128, replace=False)])

    k_max = 64
    ref_i, ref_v, ref_d = radius_neighbors(q, cloud.xyz, radius, k_max,
                                           source_mask=cloud.mask)
    grid = build_grid(cloud.xyz, cloud.mask, cell_size=radius)
    got_i, got_v, got_d = grid_radius_neighbors(grid, q, radius, k_max,
                                                bucket_cap=64)

    ref_sets = _neighbor_sets(np.asarray(ref_i), np.asarray(ref_v))
    got_sets = _neighbor_sets(np.asarray(got_i), np.asarray(got_v))
    for i, (r, g) in enumerate(zip(ref_sets, got_sets)):
        # identical unless the dense search itself truncated at k_max
        if len(r) < k_max:
            assert g == r, f"query {i}: grid={sorted(g)[:5]}.. dense={sorted(r)[:5]}.."
        else:
            assert g <= r or len(g) == k_max


def test_grid_masked_points_excluded(rng):
    xyz, _ = joint_points(rng, n_chord=300, n_stub=200)
    cloud = make_cloud(xyz, capacity=512)
    mask = np.asarray(cloud.mask).copy()
    mask[::2] = False
    grid = build_grid(cloud.xyz, jnp.asarray(mask), cell_size=0.05)
    q = cloud.xyz[:32]
    idx, valid, _ = grid_radius_neighbors(grid, q, 0.05, 32, bucket_cap=32)
    hit = np.asarray(idx)[np.asarray(valid)]
    assert mask[hit].all(), "masked points must never be returned"


def test_grid_no_neighbors(rng):
    xyz = np.zeros((64, 3), np.float32)
    cloud = make_cloud(xyz, capacity=64)
    grid = build_grid(cloud.xyz, cloud.mask, cell_size=0.05)
    far_q = jnp.full((4, 3), 10.0, jnp.float32)
    idx, valid, d = grid_radius_neighbors(grid, far_q, 0.05, 8)
    assert not np.asarray(valid).any()
