"""Lattice region growing + the fused organized segmentation front end.

The pipeline's raw-sensor path segments on the tile lattice
(``segment.organized.region_growing_lattice`` +
``pipelines.ingest.ingest_organized_segmented``) instead of building a kNN
graph — these tests pin the lattice semantics against analytic cases and
against the generic kNN-graph path on the same raycast frame, then prove
the fused front end end to end (table removed, joint kept, pose found)
mirroring the reference chain ``SHOT_demo.cpp:282-400`` +
``segmentation.cpp:94-110``.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_joints.config import DetectionConfig
from tpu_joints.segment.organized import region_growing_lattice


def _flat_lattice(H, W, z):
    """xyz [H, W, 3] of a fronto-parallel plane sampled at 1 cm pitch."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xyz = np.stack([xs * 0.01, ys * 0.01, np.full((H, W), z)], -1)
    return xyz.astype(np.float32)


def test_lattice_splits_on_depth_discontinuity():
    """Two parallel planes at different depths: image-adjacent but 3-D
    distant — max_edge must sever the boundary, giving two clusters."""
    H, W = 16, 32
    xyz = _flat_lattice(H, W, 1.0)
    xyz[:, W // 2:, 2] = 1.2  # 20 cm jump
    normals = np.zeros((H, W, 3), np.float32)
    normals[..., 2] = -1.0
    curv = np.zeros((H, W), np.float32)
    valid = np.ones((H, W), bool)
    out = region_growing_lattice(
        jnp.asarray(xyz), jnp.asarray(normals), jnp.asarray(curv),
        jnp.asarray(valid), smoothness_deg=10.0, curvature_threshold=1.0,
        min_cluster_size=5, max_edge=0.05)
    labels = np.asarray(out.labels).reshape(H, W)
    left = set(labels[:, : W // 2].ravel().tolist())
    right = set(labels[:, W // 2:].ravel().tolist())
    assert len(left) == 1 and len(right) == 1
    assert left != right
    assert -1 not in left | right


def test_lattice_seed_gate_blocks_propagation():
    """A high-curvature column can RECEIVE a label but never seed across —
    PCL's directed growth rule: the region stops at the rough band."""
    H, W = 12, 30
    xyz = _flat_lattice(H, W, 1.0)
    normals = np.zeros((H, W, 3), np.float32)
    normals[..., 2] = -1.0
    curv = np.zeros((H, W), np.float32)
    band = W // 2
    curv[:, band] = 9.0  # above the threshold: receives, never seeds
    valid = np.ones((H, W), bool)
    out = region_growing_lattice(
        jnp.asarray(xyz), jnp.asarray(normals), jnp.asarray(curv),
        jnp.asarray(valid), smoothness_deg=10.0, curvature_threshold=1.0,
        min_cluster_size=5, max_edge=0.05)
    labels = np.asarray(out.labels).reshape(H, W)
    left = set(labels[:, :band].ravel().tolist())
    right = set(labels[:, band + 1:].ravel().tolist())
    assert len(left) == 1 and len(right) == 1 and left != right
    # the band itself joins the left region (it received the growth front)
    assert set(labels[:, band].ravel().tolist()) == left


def test_lattice_min_cluster_size_filter():
    H, W = 8, 16
    xyz = _flat_lattice(H, W, 1.0)
    normals = np.zeros((H, W, 3), np.float32)
    normals[..., 2] = -1.0
    curv = np.zeros((H, W), np.float32)
    valid = np.zeros((H, W), bool)
    valid[:, :12] = True       # 96 nodes: big cluster
    valid[2:4, 14:16] = True   # 4 isolated nodes: undersized
    out = region_growing_lattice(
        jnp.asarray(xyz), jnp.asarray(normals), jnp.asarray(curv),
        jnp.asarray(valid), smoothness_deg=10.0, curvature_threshold=1.0,
        min_cluster_size=10, max_edge=0.02)
    labels = np.asarray(out.labels).reshape(H, W)
    assert (labels[:, :12] >= 0).all()
    assert (labels[2:4, 14:16] == -1).all()
    assert (labels[~np.asarray(valid)] == -1).all()


def _raycast_frame(segment_table=True):
    """Small organized frame of the bench joint (+ optional table rect)."""
    from tpu_joints.serve.depth import raycast_cylinders

    a30 = np.radians(30.0)
    cylinders = [
        (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
        (np.array([0.0, 0.0, 0.23]),
         np.array([np.sin(a30), 0.0, np.cos(a30)]), 0.05, 0.15),
    ]
    rects = []
    if segment_table:
        rects.append((np.array([0.0, 0.0, 0.45]),
                      np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                      0.35, 0.35))
    ay, ax = np.radians(35.0), np.radians(-20.0)
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rx @ Ry
    T[:3, 3] = np.array([0.02, -0.03, 1.0], np.float32)
    xyz_img = raycast_cylinders(cylinders, T, width=320, height=240,
                                rects=rects)
    valid = np.isfinite(xyz_img).all(axis=-1)
    return np.nan_to_num(xyz_img), valid, T


def _seg_cfg(**overrides):
    base = dict(
        scene_capacity=3072, scene_key_capacity=256, normal_k=16,
        remove_plane=True, segment_scene=True,
        rg_smoothness_deg=12.0, rg_max_edge=0.05,
        cluster_max_curvature=0.08, rg_min_cluster=50,
    )
    base.update(overrides)
    return DetectionConfig(**base)


def test_ingest_organized_segmented_removes_table_keeps_joint():
    from tpu_joints.pipelines.ingest import (
        ingest_organized_blocks, ingest_organized_segmented)

    xyz_img, valid, _ = _raycast_frame(segment_table=True)
    cfg = _seg_cfg()
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    scene, normals, curvature, n_sel = ingest_organized_segmented(
        jnp.asarray(xyz_img), jnp.asarray(valid), cfg, block=2,
        half_window=3, crop_lo=crop_lo, crop_hi=crop_hi)

    # reference for "how many joint tiles exist": same ingest on the
    # table-free frame, same tiling, no segmentation
    xyz_j, valid_j, _ = _raycast_frame(segment_table=False)
    joint_scene, _, _, n_joint = ingest_organized_blocks(
        jnp.asarray(xyz_j), jnp.asarray(valid_j), block=2, half_window=3,
        capacity=cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)

    kept = int(scene.count())
    nj = int(joint_scene.count())
    assert kept > 0.7 * nj, f"joint lost: kept {kept} of ~{nj} joint tiles"
    # the table is a dominant plane at z≈1.33 camera depth (raycast pose
    # puts it ~0.33 m past the joint): after plane removal + curvature
    # filtering the survivors must be (nearly) table-free
    sz = np.asarray(scene.xyz)[np.asarray(scene.mask)]
    frac_table = float(np.mean(sz[:, 2] > 1.25))
    assert frac_table < 0.05, f"{frac_table:.0%} of survivors on the table"
    # normals/curvature line up with the surviving points
    assert np.isfinite(np.asarray(normals)[np.asarray(scene.mask)]).all()
    assert (np.linalg.norm(
        np.asarray(normals)[np.asarray(scene.mask)], axis=1) > 0.9).all()


def test_lattice_matches_generic_region_growing_partition():
    """Same frame, same gates: the lattice components and the generic
    kNN-graph components must agree as partitions on the joint surface
    (sampled co-membership), proving the fast path doesn't change the
    segmentation semantics."""
    from tpu_joints.pipelines.ingest import ingest_organized_blocks
    from tpu_joints.segment import region_growing

    xyz_img, valid, _ = _raycast_frame(segment_table=True)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    # no capacity cut: tiles == lattice nodes, so indices correspond
    scene, normals, curvature, _ = ingest_organized_blocks(
        jnp.asarray(xyz_img), jnp.asarray(valid), block=2, half_window=3,
        capacity=None, crop_lo=crop_lo, crop_hi=crop_hi)
    Hb, Wb = 120, 160

    lat = region_growing_lattice(
        scene.xyz.reshape(Hb, Wb, 3), normals.reshape(Hb, Wb, 3),
        curvature.reshape(Hb, Wb), scene.mask.reshape(Hb, Wb),
        smoothness_deg=12.0, curvature_threshold=7.0,
        min_cluster_size=50, max_edge=0.05)
    gen = region_growing(
        scene, normals, curvature, k=8, smoothness_deg=12.0,
        curvature_threshold=7.0, min_cluster_size=50, max_edge=0.05)

    ll = np.asarray(lat.labels)
    gl = np.asarray(gen.labels)
    both = (ll >= 0) & (gl >= 0)
    idx = np.flatnonzero(both)
    r = np.random.default_rng(3)
    a = r.choice(idx, 400)
    b = r.choice(idx, 400)
    same_lat = ll[a] == ll[b]
    same_gen = gl[a] == gl[b]
    agree = float(np.mean(same_lat == same_gen))
    assert agree > 0.97, f"partition agreement {agree:.2%}"
    # and the clustered fraction itself is comparable
    fl, fg = float((ll >= 0).mean()), float((gl >= 0).mean())
    assert abs(fl - fg) < 0.1 * max(fl, fg) + 0.02, (fl, fg)


def test_segmented_ingest_detect_e2e(rng):
    """The full fused chain at small scale: raycast frame with table →
    organized segmentation → detect (segmentation flags OFF in detect —
    the front end already did them) → golden pose."""
    from tpu_joints.core import transforms as tr
    from tpu_joints.modelbank import build_bank
    from tpu_joints.pipelines.detect import detect
    from tpu_joints.pipelines.ingest import ingest_organized_segmented

    xyz_img, valid, T_gt = _raycast_frame(segment_table=True)
    cfg = _seg_cfg(
        descr_rad=0.06, model_ss=0.02, scene_ss=0.02,
        match_mode="nn", match_threshold=0.25, algorithm="hough",
        rf_frames="board", rf_rad=0.06, cg_size=0.05, cg_thresh=3.0,
        icp_iterations=6, icp_point_to_plane=True,
        icp_max_corr_dist=0.02, icp_max_corr_start=0.2,
        # 16 polish iterations: from the full-key-field Hough init, 8
        # leave 8.4°/89 mm while 16 converge to 0.00°/0.8 mm (CPU A/B)
        final_icp_iterations=16, max_candidates=16,
        max_instances_per_view=1, k_max=96,
        # 512 keys: the lattice-cropped frame yields ~370 uniform samples
        # at 0.02 — an undersized budget thins them uniformly
        # (filters.compact_indices) and the pose flips on the sparser
        # field; this test's subject is the segmentation front end
        scene_key_capacity=512,
    )

    rngm = np.random.default_rng(7)
    n_chord, n_stub = 3000, 1800
    theta = rngm.uniform(0, 2 * np.pi, n_chord)
    h = rngm.uniform(-0.3, 0.3, n_chord)
    chord = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)], 1)
    theta2 = rngm.uniform(0, 2 * np.pi, n_stub)
    h2 = rngm.uniform(-0.15, 0.15, n_stub)
    stub_local = np.stack(
        [0.05 * np.cos(theta2), 0.05 * np.sin(theta2), h2], 1)
    a30 = np.radians(30.0)
    R30 = np.array([[np.cos(a30), 0, np.sin(a30)], [0, 1, 0],
                    [-np.sin(a30), 0, np.cos(a30)]], np.float32)
    stub = stub_local @ R30.T + np.array([0, 0, 0.23], np.float32)
    model_xyz = np.concatenate([chord, stub]).astype(np.float32)

    bank = build_bank(
        model_xyz, descriptor="shot", descr_radius=cfg.descr_rad,
        rf_radius=cfg.rf_rad, frames="board", sampling_radius=cfg.model_ss,
        normal_k=cfg.normal_k, k_max=cfg.k_max, level=0, resolution=64,
        surface_leaf=0.01, key_capacity=64, icp_capacity=1024)

    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    scene, normals, curvature, _ = ingest_organized_segmented(
        jnp.asarray(xyz_img), jnp.asarray(valid), cfg, block=2,
        half_window=3, crop_lo=crop_lo, crop_hi=crop_hi)

    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    res = detect(scene, bank, det_cfg, scene_normals=normals,
                 scene_curvature=curvature)
    assert bool(res.accepted), (
        f"fitness={float(res.fitness)}, full={float(res.full_fitness)}")
    T_est = np.asarray(res.full_pose)
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_gt[:3, :3]),
                                         jnp.asarray(T_est[:3, :3])))
    terr = float(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    assert ang < 1.5, f"rotation error {ang}°"
    assert terr < 0.008, f"translation error {terr*1000:.1f} mm"



@pytest.fixture(scope="module")
def cyl_bank():
    """One shared bare-cylinder bank for the three detect_organized
    equivalence tests below (identical build args; the bank build is the
    dominant per-test setup cost)."""
    from tpu_joints.modelbank import build_bank

    rngm = np.random.default_rng(7)
    theta = rngm.uniform(0, 2 * np.pi, 1500)
    h = rngm.uniform(-0.3, 0.3, 1500)
    model = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)],
                     1).astype(np.float32)
    # cfg fields the build reads (kept in sync with the tests' _seg_cfg
    # calls: descr/rf 0.06, model_ss 0.02, k_max 64, normals k default)
    cfg = _seg_cfg(descr_rad=0.06, model_ss=0.02, scene_ss=0.02,
                   rf_frames="board", rf_rad=0.06, k_max=64)
    return build_bank(model, descriptor="shot", descr_radius=cfg.descr_rad,
                      rf_radius=cfg.rf_rad, frames="board",
                      sampling_radius=cfg.model_ss, normal_k=cfg.normal_k,
                      k_max=cfg.k_max, level=0, resolution=48,
                      key_capacity=32, icp_capacity=512)


def test_detect_organized_fused_matches_split(cyl_bank):
    """The one-dispatch fused program and the two-dispatch split must
    produce identical results (same jaxpr, different executable
    boundaries) — on both the plain and the lattice-crop routes."""
    import dataclasses

    from tpu_joints.modelbank import build_bank
    from tpu_joints.pipelines.detect import detect_organized

    xyz_img, valid, T_gt = _raycast_frame(segment_table=True)
    cfg = _seg_cfg(
        descr_rad=0.06, model_ss=0.02, scene_ss=0.02, rf_frames="board",
        rf_rad=0.06, cg_size=0.05, icp_iterations=4, max_candidates=4,
        max_instances_per_view=1, k_max=64, scene_key_capacity=128,
        final_icp_iterations=2)
    bank = cyl_bank
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    for route_cfg in (cfg, dataclasses.replace(cfg, segment_scene=False,
                                               remove_plane=False)):
        r_split, n_split = detect_organized(
            jnp.asarray(xyz_img), jnp.asarray(valid), bank, route_cfg,
            block=2, half_window=3, crop_lo=crop_lo, crop_hi=crop_hi,
            fused=False)
        r_fused, n_fused = detect_organized(
            jnp.asarray(xyz_img), jnp.asarray(valid), bank, route_cfg,
            block=2, half_window=3, crop_lo=crop_lo, crop_hi=crop_hi,
            fused=True)
        assert int(n_split) == int(n_fused)
        np.testing.assert_allclose(np.asarray(r_split.full_pose),
                                   np.asarray(r_fused.full_pose),
                                   rtol=0, atol=5e-4)
        assert int(r_split.view_idx) == int(r_fused.view_idx)


def test_detect_organized_batch_matches_per_frame(cyl_bank):
    """The one-dispatch batched entry (``detect_organized_batch`` — vmap of
    the fused chain, the serving steady-state formulation) must reproduce
    the per-frame fused results leaf for leaf."""
    from tpu_joints.modelbank import build_bank
    from tpu_joints.pipelines.detect import (
        detect_organized, detect_organized_batch)

    # two frames: the standard pose and a second, clearly different one
    xyz0, valid0, _ = _raycast_frame(segment_table=False)
    from tpu_joints.serve.depth import raycast_cylinders

    a30 = np.radians(30.0)
    cylinders = [
        (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
        (np.array([0.0, 0.0, 0.23]),
         np.array([np.sin(a30), 0.0, np.cos(a30)]), 0.05, 0.15),
    ]
    ay, ax = np.radians(-15.0), np.radians(20.0)
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]], np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, :3] = Rx @ Ry
    T1[:3, 3] = np.array([-0.03, 0.02, 0.95], np.float32)
    xyz1 = raycast_cylinders(cylinders, T1, width=320, height=240)
    valid1 = np.isfinite(xyz1).all(axis=-1)
    xyz1 = np.nan_to_num(xyz1)

    cfg = _seg_cfg(
        descr_rad=0.06, model_ss=0.02, scene_ss=0.02, rf_frames="board",
        rf_rad=0.06, cg_size=0.05, icp_iterations=4, max_candidates=4,
        max_instances_per_view=1, k_max=64, scene_key_capacity=128,
        final_icp_iterations=2, segment_scene=False, remove_plane=False)
    bank = cyl_bank
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)

    imgs = jnp.stack([jnp.asarray(xyz0), jnp.asarray(xyz1)])
    valids = jnp.stack([jnp.asarray(valid0), jnp.asarray(valid1)])
    r_b, n_b = detect_organized_batch(
        imgs, valids, bank, cfg, block=2, half_window=3,
        crop_lo=crop_lo, crop_hi=crop_hi)
    assert r_b.full_pose.shape == (2, 4, 4)

    for i, (img, vmask) in enumerate(((xyz0, valid0), (xyz1, valid1))):
        r_i, n_i = detect_organized(
            jnp.asarray(img), jnp.asarray(vmask), bank, cfg, block=2,
            half_window=3, crop_lo=crop_lo, crop_hi=crop_hi, fused=True)
        assert int(n_b[i]) == int(n_i)
        assert int(r_b.view_idx[i]) == int(r_i.view_idx)
        assert bool(r_b.accepted[i]) == bool(r_i.accepted)
        # vmap reassociates fp reductions and ICP iterates on them, so the
        # contract is pose equivalence, not bit equality
        A = np.asarray(r_b.full_pose[i])
        B = np.asarray(r_i.full_pose)
        Rd = A[:3, :3] @ B[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
        assert ang < 0.2, f"frame {i}: batched-vs-single rotation {ang}°"
        assert np.linalg.norm(A[:3, 3] - B[:3, 3]) < 2e-3
        np.testing.assert_allclose(float(r_b.fitness[i]),
                                   float(r_i.fitness), rtol=2e-2, atol=1e-8)


def test_lattice_key_flags_one_per_occupied_cell():
    """_lattice_key_flags: exactly one key per g×g cell that holds any
    valid tile; the key is the tile nearest the cell's mean position."""
    from tpu_joints.pipelines.ingest import _lattice_key_flags

    rng = np.random.default_rng(3)
    Hb, Wb, g = 13, 17, 3   # deliberately not multiples of g
    got = rng.random((Hb, Wb)) > 0.4
    mx = rng.normal(0, 1, (Hb, Wb)).astype(np.float32)
    my = rng.normal(0, 1, (Hb, Wb)).astype(np.float32)
    mz = rng.normal(0, 1, (Hb, Wb)).astype(np.float32)
    flag = np.asarray(_lattice_key_flags(
        (jnp.asarray(mx), jnp.asarray(my), jnp.asarray(mz)),
        jnp.asarray(got), g))

    assert not np.any(flag & ~got)
    for ci in range(0, Hb, g):
        for cj in range(0, Wb, g):
            cell = np.s_[ci:min(ci + g, Hb), cj:min(cj + g, Wb)]
            n_occ = got[cell].sum()
            n_key = flag[cell].sum()
            if n_occ == 0:
                assert n_key == 0
            else:
                # edge cells clipped by the pad can only LOSE their key if
                # the winner fell in the padded region — impossible (pad
                # tiles are invalid), so exactly one key per occupied cell
                assert n_key == 1, (ci, cj, n_occ, n_key)
                # winner = nearest to the cell's occupied-mean
                pts = np.stack([mx[cell], my[cell], mz[cell]], -1)
                occ = got[cell]
                c = pts[occ].mean(axis=0)
                d2 = np.where(occ, ((pts - c) ** 2).sum(-1), np.inf)
                assert d2[flag[cell]][0] == d2.min()


def test_detect_organized_lattice_keypoints_plumbing(cyl_bank):
    """keypoints="lattice" (EXPERIMENTAL): keys selected on the sensor
    lattice inside ingest flow through the fused chain — every key is a
    real scene point, counts land near one-per-cell, and the segmented
    route's keys avoid the cropped table. Pose quality is NOT asserted:
    the image-uniform key field measurably trades accuracy at full scale
    (1.28° vs 0.17° — docs/PERFORMANCE.md), which is why the mode is
    opt-in and the pipelines default to 3-D uniform sampling."""
    from tpu_joints.modelbank import build_bank
    from tpu_joints.pipelines.detect import detect_organized

    xyz_img, valid, T_gt = _raycast_frame(segment_table=True)
    cfg = _seg_cfg(
        descr_rad=0.06, model_ss=0.02, scene_ss=0.02, rf_frames="board",
        rf_rad=0.06, cg_size=0.05, icp_iterations=4, max_candidates=4,
        max_instances_per_view=1, k_max=64, scene_key_capacity=512,
        final_icp_iterations=4, keypoints="lattice", key_group=3)
    bank = cyl_bank
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    for route_cfg in (cfg, dataclasses.replace(cfg, segment_scene=False,
                                               remove_plane=False)):
        res, n_sel = detect_organized(
            jnp.asarray(xyz_img), jnp.asarray(valid), bank, route_cfg,
            block=2, half_window=3, crop_lo=crop_lo, crop_hi=crop_hi,
            fused=True)
        n_keys = int(res.metrics["scene_keypoints"])
        n_scene = int(res.metrics["scene_points"])
        # one key per occupied 3×3 tile cell ≈ scene/9, within slack for
        # partial cells and the normals' support rejection
        assert n_scene // 14 < n_keys <= -(-n_scene // 4), (n_keys, n_scene)
        if bool(route_cfg.segment_scene):
            # segmented route: key cells see only survivors → no keys on
            # the table plane (z ≈ 1.33 camera depth)
            from tpu_joints.pipelines.ingest import (
                ingest_organized_segmented)

            out = ingest_organized_segmented(
                jnp.asarray(xyz_img), jnp.asarray(valid), route_cfg,
                block=2, half_window=3, crop_lo=crop_lo, crop_hi=crop_hi,
                key_group=route_cfg.key_group)
            scene_c, _, _, _, kflag = out
            kxyz = np.asarray(scene_c.xyz)[np.asarray(kflag)]
            assert kxyz.shape[0] == n_keys
            assert float(np.mean(kxyz[:, 2] > 1.25)) < 0.05
