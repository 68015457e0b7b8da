import numpy as np
import jax.numpy as jnp

from tpu_joints.core.cloud import make_cloud
from tpu_joints.core import transforms as tr
from tpu_joints.recognize import (
    fitness_score,
    gc_group,
    hough_group,
    icp,
    match_nn,
    match_ratio,
    oriented_bounding_box,
    verify_hypotheses,
)
from tpu_joints.recognize.matching import Correspondences

from tests.util import joint_points, random_rigid, random_rotation


def test_match_nn_exact(rng):
    model = rng.normal(size=(40, 16)).astype(np.float32)
    perm = rng.permutation(40)
    scene = model[perm] + rng.normal(scale=1e-4, size=(40, 16)).astype(np.float32)
    ones = jnp.ones(40, bool)
    c = match_nn(jnp.asarray(scene), ones, jnp.asarray(model), ones, max_dist_sq=0.01)
    assert np.array_equal(np.asarray(c.model_idx), perm)
    assert np.asarray(c.valid).all()


def test_match_nn_gate(rng):
    model = rng.normal(size=(10, 8)).astype(np.float32)
    scene = model + 10.0  # far away
    ones = jnp.ones(10, bool)
    c = match_nn(jnp.asarray(scene), ones, jnp.asarray(model), ones, max_dist_sq=0.01)
    assert not np.asarray(c.valid).any()


def test_match_ratio(rng):
    model = np.eye(4, dtype=np.float32) * 5
    scene = np.stack([model[0] + 0.01, model[1] * 0.5 + model[2] * 0.5])
    ones2, ones4 = jnp.ones(2, bool), jnp.ones(4, bool)
    c = match_ratio(jnp.asarray(scene), ones2, jnp.asarray(model), ones4, ratio=0.8)
    v = np.asarray(c.valid)
    assert v[0]  # unambiguous match passes
    assert not v[1]  # equidistant to two model descs → ratio ≈ 1 fails 0.8


def test_icp_converges(rng):
    xyz, _ = joint_points(rng, n_chord=300, n_stub=200)
    model = make_cloud(xyz, capacity=512)
    T_true = np.eye(4, dtype=np.float32)
    # small perturbation: 5° rotation + 2cm translation
    a = np.radians(5.0)
    T_true[:3, :3] = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32
    )
    T_true[:3, 3] = [0.02, -0.01, 0.015]
    scene = make_cloud(xyz @ T_true[:3, :3].T + T_true[:3, 3], capacity=512)
    T_est, fit = icp(model, scene, jnp.eye(4), iterations=30, chunk=512)
    assert float(fit) < 1e-6
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T_true[:3, :3]), T_est[:3, :3]))
    assert ang < 0.1
    np.testing.assert_allclose(np.asarray(T_est)[:3, 3], T_true[:3, 3], atol=1e-3)


def test_icp_multi_capped_matches_uncapped(rng):
    """icp_multi_capped (config.icp_rows_per_call): splitting the
    candidate axis into sequential equal-shape calls is numerically the
    per-candidate-independent computation re-chunked — results must match
    the single wide call exactly."""
    from tpu_joints.recognize.icp import icp_multi, icp_multi_capped

    xyz, _ = joint_points(rng, n_chord=300, n_stub=200)
    scene = make_cloud(xyz, capacity=512)
    C, N = 4, 128
    src = np.stack([xyz[rng.permutation(len(xyz))[:N]] for _ in range(C)])
    mask = np.ones((C, N), bool)
    inits = np.stack([random_rigid(rng, t_scale=0.01) for _ in range(C)])
    kw = dict(iterations=5, max_corr_dist=0.05, chunk=512)
    T0, f0 = icp_multi(jnp.asarray(src), jnp.asarray(mask), scene,
                       jnp.asarray(inits), **kw)
    T1, f1 = icp_multi_capped(jnp.asarray(src), jnp.asarray(mask), scene,
                              jnp.asarray(inits), rows_cap=2 * N, **kw)
    np.testing.assert_allclose(np.asarray(T0), np.asarray(T1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-6)
    # uneven split (C=4 not divisible by per=3) must fall back to one call
    T2, f2 = icp_multi_capped(jnp.asarray(src), jnp.asarray(mask), scene,
                              jnp.asarray(inits), rows_cap=3 * N, **kw)
    np.testing.assert_allclose(np.asarray(T0), np.asarray(T2), atol=1e-6)


def test_scene_coverage_local_unexplained(rng):
    """local=True (config.coverage_local): the unexplained fraction is
    measured inside each candidate's own model footprint, so a second
    object elsewhere in the scene no longer floods the gate — a true pose
    stays ~0 while a pose that strands points inside its own footprint
    still pays."""
    from tpu_joints.recognize.icp import scene_coverage_multi

    xyz, _ = joint_points(rng, n_chord=400, n_stub=250)
    other = xyz + np.array([1.5, 0.0, 0.0], np.float32)  # far second object
    scene = make_cloud(np.concatenate([xyz, other]), capacity=2048)
    T_true = np.eye(4, dtype=np.float32)
    T_shift = np.eye(4, dtype=np.float32)
    T_shift[:3, 3] = [0.0, 0.12, 0.0]   # strands its own footprint
    Ts = jnp.asarray(np.stack([T_true, T_shift]))
    m = jnp.asarray(xyz)
    mask = jnp.ones((xyz.shape[0],), bool)
    _, unexp_g = scene_coverage_multi(scene, m, mask, Ts, chunk=512)
    _, unexp_l = scene_coverage_multi(scene, m, mask, Ts, chunk=512,
                                      local=True)
    # global: even the true pose is ~50% unexplained (the second object)
    assert float(unexp_g[0]) > 0.4
    # local: the true pose explains its own footprint
    assert float(unexp_l[0]) < 0.01, float(unexp_l[0])
    # a stranding pose still pays inside its own footprint
    assert float(unexp_l[1]) > 0.1, float(unexp_l[1])


def test_icp_max_corr_dist_rejects_outliers(rng):
    xyz, _ = joint_points(rng, n_chord=300, n_stub=200)
    model = make_cloud(xyz, capacity=1024)
    scene_pts = np.concatenate([xyz + [0.005, 0, 0], rng.uniform(-2, 2, (300, 3)).astype(np.float32)])
    scene = make_cloud(scene_pts, capacity=1024)
    T_est, _ = icp(model, scene, jnp.eye(4), iterations=10, max_corr_dist=0.02, chunk=512)
    np.testing.assert_allclose(np.asarray(T_est)[:3, 3], [0.005, 0, 0], atol=1e-3)


def _synthetic_grouping_problem(rng, n_model=60, n_outliers=15):
    """Model keypoints with random LRFs; scene = rigidly moved copy plus
    outlier correspondences pointing at random scene locations."""
    T = random_rigid(rng, t_scale=0.5)
    R = T[:3, :3]
    model_keys = rng.uniform(-0.2, 0.2, (n_model, 3)).astype(np.float32)
    model_rf = np.stack([random_rotation(rng) for _ in range(n_model)])  # rows=axes
    scene_keys = (model_keys @ R.T + T[:3, 3]).astype(np.float32)
    scene_rf = np.einsum("mij,kj->mik", model_rf, R)  # axes rotate: a' = R a
    # append outliers: scene keypoints at random positions matched to random models
    out_scene = rng.uniform(-1, 1, (n_outliers, 3)).astype(np.float32)
    out_rf = np.stack([random_rotation(rng) for _ in range(n_outliers)])
    scene_all = np.concatenate([scene_keys, out_scene])
    scene_rf_all = np.concatenate([scene_rf, out_rf]).astype(np.float32)
    model_idx = np.concatenate([np.arange(n_model), rng.integers(0, n_model, n_outliers)])
    M = n_model + n_outliers
    corrs = Correspondences(
        model_idx=jnp.asarray(model_idx.astype(np.int32)),
        valid=jnp.ones(M, bool),
        dist_sq=jnp.asarray(np.full(M, 0.05, np.float32)),
    )
    return T, model_keys, model_rf.astype(np.float32), scene_all, scene_rf_all, corrs


def test_hough_recovers_pose(rng):
    T, mk, mrf, sk, srf, corrs = _synthetic_grouping_problem(rng)
    n_model = mk.shape[0]
    inst = hough_group(
        jnp.asarray(sk), jnp.asarray(srf), jnp.ones(sk.shape[0], bool),
        jnp.asarray(mk), jnp.asarray(mrf), jnp.ones(n_model, bool),
        jnp.ones(n_model, bool), corrs,
        bin_size=0.03, threshold=3.0, max_instances=4,
    )
    valid = np.asarray(inst.valid)
    assert valid.any()
    best = np.argmax(np.where(valid, np.asarray(inst.votes), -1))
    T_est = np.asarray(inst.poses)[best]
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T[:3, :3]), jnp.asarray(T_est[:3, :3])))
    assert ang < 1.0
    np.testing.assert_allclose(T_est[:3, 3], T[:3, 3], atol=5e-3)
    # the winning instance groups (mostly) the inlier correspondences
    assert np.asarray(inst.n_corrs)[best] >= 0.8 * mk.shape[0]


def test_gc_recovers_pose(rng):
    T, mk, mrf, sk, srf, corrs = _synthetic_grouping_problem(rng)
    inst = gc_group(
        jnp.asarray(sk), jnp.asarray(mk), jnp.ones(mk.shape[0], bool), corrs,
        gc_size=0.01, gc_threshold=10.0, max_instances=4,
    )
    valid = np.asarray(inst.valid)
    assert valid.any()
    best = np.argmax(np.where(valid, np.asarray(inst.votes), -1))
    T_est = np.asarray(inst.poses)[best]
    ang = float(tr.rotation_geodesic_deg(jnp.asarray(T[:3, :3]), jnp.asarray(T_est[:3, :3])))
    assert ang < 1.0
    np.testing.assert_allclose(T_est[:3, 3], T[:3, 3], atol=5e-3)


def test_hough_rotation_mode_split_recovers_flip_dominated_pose(rng):
    """Symmetric-part failure mode: true and 180°-flipped matches vote for
    the SAME centroid bin (a flip about an axis through the centroid
    preserves it), so the per-bin Umeyama follows the dominant mode — when
    flip matches carry more weight, the true pose vanishes from the
    instance list. ``split_rotation_modes`` must emit BOTH rotation modes
    of the top bin so downstream ranking can arbitrate."""
    T = random_rigid(rng, t_scale=0.4)
    R = T[:3, :3]
    n = 30
    # symmetric "object": keypoint m has partner S(m), S = 180° about z
    # through the centroid; the LRF field co-rotates with the symmetry
    S = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    base = rng.uniform(-0.15, 0.15, (n, 3)).astype(np.float32)
    model_keys = np.concatenate([base, base @ S.T])           # [2n, 3]
    base_rf = np.stack([random_rotation(rng) for _ in range(n)])
    model_rf = np.concatenate([base_rf, base_rf @ S.T]).astype(np.float32)

    scene_keys = (model_keys[:n] @ R.T + T[:3, 3]).astype(np.float32)
    scene_rf = np.einsum("mij,kj->mik", base_rf, R).astype(np.float32)

    # every scene point gets TWO correspondences: the true one (weaker)
    # and the flip partner (stronger descriptor match) — flip dominates
    sk = np.concatenate([scene_keys, scene_keys])
    srf = np.concatenate([scene_rf, scene_rf])
    model_idx = np.concatenate([np.arange(n), np.arange(n, 2 * n)])
    dist_sq = np.concatenate([np.full(n, 0.15, np.float32),
                              np.full(n, 0.01, np.float32)])
    corrs = Correspondences(
        model_idx=jnp.asarray(model_idx.astype(np.int32)),
        valid=jnp.ones(2 * n, bool),
        dist_sq=jnp.asarray(dist_sq),
    )

    def run(split):
        return hough_group(
            jnp.asarray(sk), jnp.asarray(srf), jnp.ones(2 * n, bool),
            jnp.asarray(model_keys), jnp.asarray(model_rf),
            jnp.ones(2 * n, bool), jnp.ones(2 * n, bool), corrs,
            bin_size=0.03, threshold=3.0, max_instances=2,
            split_rotation_modes=split,
        )

    def best_rot_err(inst):
        valid = np.asarray(inst.valid)
        errs = [float(tr.rotation_geodesic_deg(
            jnp.asarray(T[:3, :3]), jnp.asarray(p[:3, :3])))
            for p, v in zip(np.asarray(inst.poses), valid) if v]
        return min(errs) if errs else 1e9

    # without the split the flip-dominated bin swallows the true pose
    assert best_rot_err(run(False)) > 90.0
    # with it, one emitted mode is the true pose
    assert best_rot_err(run(True)) < 1.0
    """Full-sensor-scale failure mode (scripts/exp_gc_fullscale.py): when
    spurious correspondences outnumber the rigid cluster ~10:1 under a
    loose ``gc_size`` (3 cm on a ~1 m scene), random pairs agree often
    enough that the largest CONSISTENT SET is a diffuse spam blob —
    support-seeded grouping never extracts the true instance. The fixed
    grouping seeds by descriptor-match quality (PCL's sorted walk) and
    prunes by agreement relative to the strongest member, so the rigid
    clique must win here."""
    T = random_rigid(rng, t_scale=0.3)
    R = T[:3, :3]
    n_true, n_spam = 25, 280
    model_keys = rng.uniform(-0.15, 0.15, (64, 3)).astype(np.float32)
    true_scene = (model_keys[:n_true] @ R.T + T[:3, 3]).astype(np.float32)
    spam_scene = rng.uniform(-0.5, 0.5, (n_spam, 3)).astype(np.float32)
    scene = np.concatenate([true_scene, spam_scene])
    model_idx = np.concatenate(
        [np.arange(n_true), rng.integers(0, 64, n_spam)]).astype(np.int32)
    # true matches carry the best descriptor distances, spam the worst —
    # the property the quality-ordered seeding keys off (real pipelines
    # get this for free from the match gate)
    dist_sq = np.concatenate(
        [np.full(n_true, 0.02, np.float32),
         rng.uniform(0.05, 0.19, n_spam).astype(np.float32)])
    corrs = Correspondences(
        model_idx=jnp.asarray(model_idx),
        valid=jnp.ones(n_true + n_spam, bool),
        dist_sq=jnp.asarray(dist_sq),
    )
    inst = gc_group(
        jnp.asarray(scene), jnp.asarray(model_keys),
        jnp.ones(64, bool), corrs,
        gc_size=0.03, gc_threshold=3.0, max_instances=8,
    )
    valid = np.asarray(inst.valid)
    assert valid.any()
    poses = np.asarray(inst.poses)
    angs = [float(tr.rotation_geodesic_deg(jnp.asarray(T[:3, :3]),
                                           jnp.asarray(poses[i][:3, :3])))
            for i in range(len(valid)) if valid[i]]
    ts = [np.linalg.norm(poses[i][:3, 3] - T[:3, 3])
          for i in range(len(valid)) if valid[i]]
    # the true instance must be among the extracted clusters (downstream
    # ICP fitness ranking arbitrates between instances in the pipeline)
    assert min(angs) < 1.0 and min(ts) < 5e-3, (angs, ts)


def test_verify_hypotheses_picks_real_instance(rng):
    xyz, _ = joint_points(rng, n_chord=250, n_stub=150)
    scene = make_cloud(xyz, capacity=512)
    good = np.pad(xyz + rng.normal(scale=1e-4, size=xyz.shape).astype(np.float32),
                  ((0, 512 - xyz.shape[0]), (0, 0)), constant_values=1e6)
    bad = good + np.array([0.5, 0.5, 0.5], np.float32)
    inst_xyz = jnp.asarray(np.stack([good, bad]))
    mask = np.zeros((2, 512), bool)
    mask[:, : xyz.shape[0]] = True
    picked = np.asarray(
        verify_hypotheses(
            inst_xyz, jnp.asarray(mask), jnp.ones(2, bool), scene,
            inlier_threshold=0.005, chunk=512,
        )
    )
    assert picked[0] and not picked[1]


def test_verify_hypotheses_greedy_above_16(rng):
    """H > 16 takes the greedy local-search path (VERDICT round-2 item 7:
    the multi-part pipeline pools P·C candidates past the exhaustive cap).
    One true instance among 23 offset copies at H=24 must be the sole
    survivor."""
    xyz, _ = joint_points(rng, n_chord=250, n_stub=150)
    scene = make_cloud(xyz, capacity=512)
    good = np.pad(xyz + rng.normal(scale=1e-4, size=xyz.shape).astype(np.float32),
                  ((0, 512 - xyz.shape[0]), (0, 0)), constant_values=1e6)
    H = 24
    insts = [good]
    for h in range(1, H):
        off = 0.3 + 0.05 * h
        insts.append(good + np.array([off, -off, off], np.float32))
    inst_xyz = jnp.asarray(np.stack(insts))
    mask = np.zeros((H, 512), bool)
    mask[:, : xyz.shape[0]] = True
    valid = np.ones(H, bool)
    valid[-1] = False  # padding hypothesis must never activate
    picked = np.asarray(
        verify_hypotheses(
            inst_xyz, jnp.asarray(mask), jnp.asarray(valid), scene,
            inlier_threshold=0.005, chunk=512,
        )
    )
    assert picked[0]
    assert not picked[1:].any()


def test_greedy_hv_matches_exhaustive_small(rng):
    """On an enumerable instance the greedy fallback should land on the
    exhaustive optimum (two overlapping half-explanations + one clutter
    hypothesis — a case where pure forward-greedy orderings can differ)."""
    from tpu_joints.recognize.hv import _explained_matrix, _greedy_verify

    xyz, _ = joint_points(rng, n_chord=250, n_stub=150)
    scene = make_cloud(xyz, capacity=512)
    n = xyz.shape[0]
    pad = ((0, 512 - n), (0, 0))
    full = np.pad(xyz, pad, constant_values=1e6)
    half_a = full.copy(); half_a[n // 2:] = 1e6
    half_b = full.copy(); half_b[: n // 2] = 1e6
    clutter = full + 0.4
    inst_xyz = jnp.asarray(np.stack([half_a, half_b, clutter, full]))
    mask = np.zeros((4, 512), bool)
    mask[0, : n // 2] = True
    mask[1, n // 2: n] = True
    mask[2, :n] = True
    mask[3, :n] = True
    valid = jnp.ones(4, bool)
    explained, outliers = _explained_matrix(
        inst_xyz, jnp.asarray(mask), scene, 0.005, 512)
    explained = explained & valid[:, None]
    greedy = np.asarray(_greedy_verify(explained, outliers, valid,
                                       0.001, 1.0))
    exhaustive = np.asarray(
        verify_hypotheses(inst_xyz, jnp.asarray(mask), valid, scene,
                          inlier_threshold=0.005, chunk=512))
    np.testing.assert_array_equal(greedy, exhaustive)


def test_obb_recovers_box(rng):
    dims = np.array([0.4, 0.2, 0.1], np.float32)
    pts = rng.uniform(-0.5, 0.5, (800, 3)).astype(np.float32) * dims
    R = random_rotation(rng)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    cloud = make_cloud(pts @ R.T + t, capacity=1024)
    box = oriented_bounding_box(cloud)
    np.testing.assert_allclose(np.sort(np.asarray(box.extents)), np.sort(dims), atol=0.02)
    np.testing.assert_allclose(np.asarray(box.position), t, atol=0.02)
    Rb = np.asarray(box.rotation)
    np.testing.assert_allclose(Rb.T @ Rb, np.eye(3), atol=1e-4)


def test_obb_largest_cluster_ignores_stray_points(rng):
    """Reference OBB semantics (SHOT_demo.cpp:697-740, VERDICT round-2
    missing item 4): region-grow the aligned model and box the dominant
    cluster only. A partially-occluded alignment leaves a detached,
    differently-oriented patch of stray points; the whole-cloud box is
    skewed by it while the clustered box recovers the main surface."""
    from tpu_joints.recognize.obb import oriented_bounding_box_clustered

    # main surface: a 0.4 x 0.2 horizontal plane patch (normals +z)
    gx, gy = np.meshgrid(np.linspace(-0.2, 0.2, 30),
                         np.linspace(-0.1, 0.1, 20))
    main = np.stack([gx.ravel(), gy.ravel(),
                     np.zeros(gx.size)], 1).astype(np.float32)
    main += rng.normal(0, 5e-4, main.shape).astype(np.float32)
    # stray occlusion artifact: a small VERTICAL patch (normals +x) far off
    sy, sz = np.meshgrid(np.linspace(0, 0.05, 6), np.linspace(0, 0.05, 5))
    stray = np.stack([np.full(sy.size, 0.6), sy.ravel(),
                      sz.ravel()], 1).astype(np.float32)
    stray += rng.normal(0, 5e-4, stray.shape).astype(np.float32)
    cloud = make_cloud(np.concatenate([main, stray]), capacity=1024)

    whole = oriented_bounding_box(cloud)
    clustered = oriented_bounding_box_clustered(cloud, min_cluster_size=50)
    # whole-cloud box spans the 0.6 m gap; clustered box is the main patch
    assert float(np.max(np.asarray(whole.extents))) > 0.5
    np.testing.assert_allclose(
        np.sort(np.asarray(clustered.extents))[::-1][:2], [0.4, 0.2],
        atol=0.02)
    np.testing.assert_allclose(np.asarray(clustered.position)[:2], [0, 0],
                               atol=0.02)


def test_icp_bad_init_convergence_regime(rng):
    """VERDICT weak item 7: the reference runs 100 point-to-point
    iterations (SHOT.cpp:180); the framework defaults to 30 justified by
    exact NN. Validate at the reference's convergence-from-bad-init
    regime: a partial view started 15°/5 cm off must converge to the
    same pose at 30 iterations as at 100."""
    import dataclasses

    from tpu_joints.core import transforms as tr
    from tpu_joints.recognize.icp import icp

    xyz, _ = joint_points(rng, n_chord=900, n_stub=500)
    # partial overlap: a half view as the source
    src_np = xyz[xyz[:, 1] > -0.01]
    ang = np.radians(15.0)
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    bad = np.eye(4, dtype=np.float32)
    bad[:3, :3] = Rz
    bad[:3, 3] = [0.03, -0.04, 0.02]

    src = make_cloud(src_np, capacity=1024)
    tgt = make_cloud(xyz, capacity=2048)
    T30, fit30 = icp(src, tgt, jnp.asarray(bad), iterations=30,
                     max_corr_dist=0.05, max_corr_start=0.15)
    T100, fit100 = icp(src, tgt, jnp.asarray(bad), iterations=100,
                       max_corr_dist=0.05, max_corr_start=0.15)
    # both must undo the perturbation (identity is the true pose)
    for T, fit, n in ((T30, fit30, 30), (T100, fit100, 100)):
        a = float(tr.rotation_geodesic_deg(jnp.eye(3), jnp.asarray(T)[:3, :3]))
        t = float(np.linalg.norm(np.asarray(T)[:3, 3]))
        assert a < 1.0 and t < 0.005, f"{n} iters: {a:.2f}deg {t*1000:.1f}mm"
    assert float(fit30) <= 1.2 * float(fit100) + 1e-12


def test_scene_coverage_discriminates_flip(rng):
    """The scene→model coverage term must separate a 180° chord-axis flip
    from the true pose by orders of magnitude, where the model→scene
    fitness (the reference's score2) barely separates them — the CAD's
    occluded back dominates score2 for both poses alike."""
    from tpu_joints.recognize.icp import fitness_multi, scene_coverage_multi

    model_xyz, _ = joint_points(rng, n_chord=2000, n_stub=1200)
    # camera at -y: the scene is the joint's camera-facing half
    front = model_xyz[model_xyz[:, 1] < 0.0]
    T_true = np.eye(4, dtype=np.float32)
    # 180° about the chord (x) axis: chord maps to itself, the stub flips
    # to the occluded side — the classic near-symmetry failure mode
    T_flip = np.diag(np.array([1.0, -1.0, -1.0, 1.0], np.float32))
    scene = make_cloud(front, capacity=2048)
    Ts = jnp.stack([jnp.asarray(T_true), jnp.asarray(T_flip)])

    cov, unexplained = scene_coverage_multi(
        scene, jnp.asarray(model_xyz),
        jnp.ones(model_xyz.shape[0], bool), Ts, clip=0.05)
    cov, unexplained = np.asarray(cov), np.asarray(unexplained)
    fit = np.asarray(fitness_multi(
        jnp.asarray(model_xyz), jnp.ones(model_xyz.shape[0], bool),
        scene, Ts))
    # coverage: true pose explains every scene point; the flip strands the
    # scene's stub entirely
    assert cov[0] < 1e-5, cov
    assert cov[1] > 30.0 * max(cov[0], 1e-7), cov
    # the acceptance signal: zero unexplained fraction at the true pose,
    # the stub's share of the scene at the flip
    assert unexplained[0] < 0.01, unexplained
    assert unexplained[1] > 0.10, unexplained
    # score2 alone is the weak discriminator this term exists to fix
    assert fit[1] < 10.0 * fit[0], fit
