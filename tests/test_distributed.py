"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4 'Distributed').

Verifies the DP/TP sharded batch pipeline produces the same result as the
single-device path, and that the ring-kNN / bank-sharded-matching
collectives agree with their dense oracles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_joints.core.cloud import make_cloud
from tpu_joints.distributed import (
    make_mesh,
    detect_batch,
    ring_knn,
    shard_inputs,
    sharded_match_votes,
    stack_clouds,
)
from tpu_joints.neighbors import knn

from tests.util import joint_points


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh(8, model_parallel=2)


@pytest.fixture(scope="module")
def mesh1d():
    return make_mesh(8, model_parallel=8)  # pure model axis for ring tests


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 4, "model": 2}


def test_ring_knn_matches_dense(mesh1d, rng=None):
    rng = np.random.default_rng(3)
    M, N, k = 64, 128, 5
    q = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) > 0.2)

    d_ref, i_ref = knn(q, s, k, source_mask=mask)
    d_ring, i_ring = ring_knn(q, s, mask, k, mesh1d, axis="model")
    np.testing.assert_allclose(np.asarray(d_ring), np.asarray(d_ref), rtol=1e-5, atol=1e-6)
    # indices may differ under distance ties; check distances via gather
    gathered = np.asarray(jnp.sum((q[:, None, :] - s[i_ring]) ** 2, axis=-1))
    np.testing.assert_allclose(gathered, np.asarray(d_ref), rtol=1e-5, atol=1e-6)


def test_sharded_match_votes(mesh1d):
    rng = np.random.default_rng(4)
    Ms, V, Mk, D = 32, 8, 16, 33
    sd = jnp.asarray(rng.normal(size=(Ms, D)).astype(np.float32))
    bd = jnp.asarray(rng.normal(size=(V, Mk, D)).astype(np.float32))
    bv = jnp.asarray(rng.uniform(size=(V, Mk)) > 0.3)
    thresh = 30.0

    votes = sharded_match_votes(sd, bd, bv, thresh, mesh1d, axis="model")

    # dense oracle
    d = np.sum((np.asarray(sd)[:, None, None, :] - np.asarray(bd)[None]) ** 2, axis=-1)
    d = np.where(np.asarray(bv)[None], d, np.inf)
    expected = (d.min(axis=-1) < thresh).sum(axis=0)
    np.testing.assert_array_equal(np.asarray(votes), expected)


def test_detect_batch_sharded_matches_single(mesh):
    from tpu_joints.config import DetectionConfig
    from tpu_joints.modelbank import build_bank, render_views
    from tpu_joints.pipelines import detect

    cfg = DetectionConfig(
        descriptor="shot", descr_rad=0.12, model_ss=0.04, scene_ss=0.04,
        normal_k=10, match_mode="nn", match_threshold=0.25,
        algorithm="hough", cg_size=0.05, cg_thresh=3.0,
        icp_iterations=5, max_candidates=2, max_instances_per_view=2,
        scene_capacity=512, scene_key_capacity=32, k_max=16,
    )
    rng = np.random.default_rng(0)
    model_xyz, _ = joint_points(rng, n_chord=400, n_stub=250)
    bank = build_bank(
        model_xyz, descriptor="shot", descr_radius=cfg.descr_rad,
        sampling_radius=cfg.model_ss, normal_k=cfg.normal_k, k_max=cfg.k_max,
        level=0, resolution=48, key_capacity=32,
    )
    views, poses, _ = render_views(model_xyz, level=0, resolution=48)
    order = np.argsort([-v.shape[0] for v in views])[:4]
    scenes = [make_cloud(views[i][:512], capacity=512) for i in order]

    single = [detect(s, bank, cfg) for s in scenes]

    batch = stack_clouds(scenes)
    batch_sh, bank_sh = shard_inputs(batch, bank, mesh)
    out = detect_batch(batch_sh, bank_sh, cfg)

    for b, ref in enumerate(single):
        np.testing.assert_allclose(
            np.asarray(out.full_pose[b]), np.asarray(ref.full_pose),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            float(out.fitness[b]), float(ref.fitness), rtol=1e-4, atol=1e-8
        )

    # the explicit shard_map TP formulation (grouping per view shard; only
    # [V, P] instance tables cross the model axis — no f32[V, 64³]
    # accumulator all-gather, docs/PARITY.md) must agree with GSPMD
    out_sm = detect_batch(batch_sh, bank_sh, cfg, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(out.view_idx), np.asarray(out_sm.view_idx))
    np.testing.assert_allclose(
        np.asarray(out.full_pose), np.asarray(out_sm.full_pose),
        rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out.cand_fitness), np.asarray(out_sm.cand_fitness),
        rtol=2e-4, atol=1e-9)


def test_ring_icp_matches_single_device(mesh1d):
    """Sharded ICP (VERDICT item 9): ring-NN correspondences + psum'd
    Umeyama moments reproduce the single-device ICP to float tolerance."""
    from tpu_joints.distributed import ring_icp
    from tpu_joints.recognize.icp import icp

    rng = np.random.default_rng(11)
    model, _ = joint_points(rng, n_chord=600, n_stub=360)
    # a modest misalignment: the oracle and the ring must walk the same path
    ang = np.radians(8.0)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    scene_xyz = (model @ R.T + np.array([0.02, -0.015, 0.01], np.float32))

    M = 960  # divisible by 8
    src = jnp.asarray(model[:M])
    src_mask = jnp.ones((M,), bool)
    tgt = jnp.asarray(scene_xyz[:M])
    tgt_mask = jnp.ones((M,), bool)

    T_ring, fit_ring = ring_icp(src, src_mask, tgt, tgt_mask, mesh1d,
                                axis="model", iterations=12,
                                max_corr_dist=0.1)
    src_cloud = make_cloud(np.asarray(src), capacity=M)
    target_cloud = make_cloud(np.asarray(tgt), capacity=M)
    T_ref, fit_ref = icp(src_cloud, target_cloud, jnp.eye(4),
                         iterations=12, max_corr_dist=0.1)

    np.testing.assert_allclose(np.asarray(T_ring), np.asarray(T_ref),
                               atol=5e-4)
    assert abs(float(fit_ring) - float(fit_ref)) < 1e-6
    # and it actually recovered the rigid motion
    np.testing.assert_allclose(np.asarray(T_ring)[:3, :3], R, atol=5e-3)


def test_halo_radius_neighbors_matches_dense(mesh1d):
    """Boundary-band halo exchange (VERDICT round-2 item 5): slab-sharded
    radius self-neighborhoods must equal the dense oracle while each link
    carries only the `halo` boundary points, not the full block."""
    from tpu_joints.distributed import halo_radius_neighbors
    from tpu_joints.neighbors import radius_neighbors

    rng = np.random.default_rng(11)
    N, k_max, radius = 1024, 12, 0.08
    # a long noisy cylinder along x: slab-shardable, every slab populated
    theta = rng.uniform(0, 2 * np.pi, N)
    xyz = np.stack([rng.uniform(-1.0, 1.0, N),
                    0.1 * np.cos(theta), 0.1 * np.sin(theta)], 1)
    xyz += rng.normal(0, 1e-3, xyz.shape)
    xyz = np.asarray(xyz[np.argsort(xyz[:, 0])], np.float32)  # slab sort
    mask = rng.uniform(size=N) > 0.1
    xyzj, maskj = jnp.asarray(xyz), jnp.asarray(mask)

    idx, valid, dsq = halo_radius_neighbors(
        xyzj, maskj, radius, k_max, mesh1d, axis="model", halo=128)
    i_ref, v_ref, d_ref = radius_neighbors(
        xyzj, xyzj, radius, k_max, source_mask=maskj)

    # same neighbor sets per query (order/ties aside): compare index sets
    # and distances where valid
    for q in range(0, N, 37):
        got = set(np.asarray(idx)[q][np.asarray(valid)[q]].tolist())
        want = set(np.asarray(i_ref)[q][np.asarray(v_ref)[q]].tolist())
        assert got == want, (q, got ^ want)
    np.testing.assert_allclose(
        np.sort(np.where(np.asarray(valid), np.asarray(dsq), 1e9), axis=1),
        np.sort(np.where(np.asarray(v_ref), np.asarray(d_ref), 1e9), axis=1),
        rtol=1e-5, atol=1e-7)

    # halo capacity beyond the shard size must clamp (not trace-fail):
    # the default halo=256 exceeds n_local=128 here — small shards simply
    # exchange everything, the dense-oracle limit
    idx2, valid2, _ = halo_radius_neighbors(
        xyzj, maskj, radius, k_max, mesh1d, axis="model", halo=256)
    for q in range(0, N, 111):
        got = set(np.asarray(idx2)[q][np.asarray(valid2)[q]].tolist())
        want = set(np.asarray(i_ref)[q][np.asarray(v_ref)[q]].tolist())
        assert got == want, (q, got ^ want)
