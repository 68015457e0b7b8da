import numpy as np
import jax.numpy as jnp

from tpu_joints.core.cloud import make_cloud, to_numpy
from tpu_joints.filters import (
    compact_cloud,
    compact_indices,
    passthrough,
    uniform_sample_mask,
    voxel_downsample,
)


def test_passthrough(rng):
    pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    c = make_cloud(pts)
    out = passthrough(c, "z", 0.0, 0.5)
    kept = to_numpy(out)
    assert np.all((kept[:, 2] >= 0) & (kept[:, 2] <= 0.5))
    assert kept.shape[0] == np.sum((pts[:, 2] >= 0) & (pts[:, 2] <= 0.5))


def test_voxel_downsample_centroids(rng):
    pts = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    leaf = 0.25
    c = make_cloud(pts)
    out = voxel_downsample(c, leaf)
    got = to_numpy(out)
    # numpy oracle
    lo = pts.min(0)
    ids = np.floor((pts - lo) / leaf).astype(int)
    key = ids[:, 0] * 10_000 + ids[:, 1] * 100 + ids[:, 2]
    cents = np.stack([pts[key == k].mean(0) for k in np.unique(key)])
    assert got.shape[0] == cents.shape[0]
    got_sorted = got[np.lexsort(got.T)]
    cents_sorted = cents[np.lexsort(cents.T)]
    np.testing.assert_allclose(got_sorted, cents_sorted, atol=1e-5)


def test_uniform_sampling_one_per_voxel(rng):
    pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    r = 0.2
    c = make_cloud(pts)
    keep = np.asarray(uniform_sample_mask(c, r))
    sel = np.asarray(c.xyz)[keep]
    lo = pts.min(0)
    ids = np.floor((pts - lo) / r).astype(int)
    key = ids[:, 0] * 10_000 + ids[:, 1] * 100 + ids[:, 2]
    n_voxels = len(np.unique(key))
    assert sel.shape[0] == n_voxels
    # each selected point is the nearest-to-centroid member of its voxel
    for p in sel:
        i = np.floor((p - lo) / r).astype(int)
        kk = i[0] * 10_000 + i[1] * 100 + i[2]
        members = pts[key == kk]
        centroid = members.mean(0)
        d = ((members - centroid) ** 2).sum(1)
        d_sel = ((p - centroid) ** 2).sum()
        # nearest-to-centroid up to float32 ties
        assert d_sel <= d.min() + 1e-8


def test_compact(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    c = make_cloud(pts, capacity=64)
    sel = np.zeros(64, bool)
    sel[[3, 10, 20]] = True
    out, idx = compact_cloud(c, jnp.asarray(sel), 8)
    assert int(out.count()) == 3
    np.testing.assert_allclose(to_numpy(out), pts[[3, 10, 20]], atol=0)
    # overflow thins UNIFORMLY (every ceil(n/cap)-th selected lane), not by
    # prefix — lanes arrive in spatial order, so a prefix would silently
    # drop a contiguous scene region (see compact_indices docstring)
    i, v = compact_indices(jnp.asarray(sel), 2)
    assert np.asarray(i)[:2].tolist() == [3, 20]
    assert np.asarray(v).all()


def test_compact_indices_pads_to_capacity():
    """Static-shape contract: the output really is [capacity] lanes even
    when the input has FEWER lanes than capacity — a bare slice would
    clamp, and a Cloud built from it would break every consumer keyed on
    cfg.scene_capacity (stack_clouds, pre-compiled executables)."""
    sel = jnp.asarray(np.array([True, False, True, True], bool))
    idx, ok = compact_indices(sel, 16)
    assert idx.shape == (16,) and ok.shape == (16,)
    assert int(ok.sum()) == 3
    assert np.asarray(idx)[np.asarray(ok)].tolist() == [0, 2, 3]
    assert not np.asarray(ok)[3:].any()   # padding lanes are invalid
