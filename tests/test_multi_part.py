"""Multi-part ({chord, stub}) detection tests (SURVEY.md §2.1 part loop)."""
import numpy as np

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import make_cloud
from tpu_joints.modelbank import build_bank, render_views
from tpu_joints.pipelines import detect_parts

from tests.util import cylinder_points

CFG = DetectionConfig(
    descriptor="shot", descr_rad=0.12, model_ss=0.04, scene_ss=0.04,
    normal_k=10, match_mode="nn", match_threshold=0.25,
    algorithm="hough", cg_size=0.05, cg_thresh=3.0,
    icp_iterations=10, max_candidates=2, max_instances_per_view=2,
    scene_capacity=1024, scene_key_capacity=64, k_max=24,
)


def _bank(xyz):
    return build_bank(
        xyz, descriptor="shot", descr_radius=CFG.descr_rad,
        sampling_radius=CFG.model_ss, normal_k=CFG.normal_k, k_max=CFG.k_max,
        level=0, resolution=64, key_capacity=48,
    )


def test_detect_parts_picks_right_part(rng):
    # two clearly different parts: thin long tube vs fat short ring
    chord, _ = cylinder_points(rng, radius=0.05, height=0.6, n=700, axis="x")
    stub, _ = cylinder_points(rng, radius=0.12, height=0.15, n=700, axis="z")
    banks = {"chord": _bank(chord), "stub": _bank(stub)}

    views, poses, _ = render_views(stub, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    scene = make_cloud(views[v][:1024], capacity=CFG.scene_capacity)

    out = detect_parts(scene, banks, CFG)
    assert set(out.per_part) == {"chord", "stub"}
    assert out.part == "stub", (
        f"chose {out.part}: stub fit={float(out.per_part['stub'].fitness)}, "
        f"chord fit={float(out.per_part['chord'].fitness)}"
    )
    assert float(out.result.fitness) < float(out.per_part["chord"].fitness)


def test_detect_parts_honors_hv(rng):
    """cfg.hv_enabled must actually run hypothesis verification on the
    multi-part path (round-2 advisor: it was silently ignored). The true
    part's winner survives HV; at minimum cand_verified must differ from
    the blanket cand_valid copy for the losing part's far-off candidates."""
    import dataclasses

    chord, _ = cylinder_points(rng, radius=0.05, height=0.6, n=700, axis="x")
    stub, _ = cylinder_points(rng, radius=0.12, height=0.15, n=700, axis="z")
    banks = {"chord": _bank(chord), "stub": _bank(stub)}
    views, poses, _ = render_views(stub, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    scene = make_cloud(views[v][:1024], capacity=CFG.scene_capacity)

    cfg = dataclasses.replace(CFG, hv_enabled=True, hv_inlier_threshold=0.01,
                              hv_occlusion_threshold=0.001)
    out = detect_parts(scene, banks, cfg)
    assert out.part == "stub"
    assert bool(out.result.cand_verified.reshape(-1).any())
    # HV is a joint optimization: activating a hypothesis far from the
    # scene costs outliers with no explanation gain, so the pooled mask
    # must reject at least one candidate that plain validity kept
    n_valid = sum(int(np.asarray(r.cand_valid).sum())
                  for r in out.per_part.values())
    n_verified = sum(int(np.asarray(r.cand_verified).sum())
                     for r in out.per_part.values())
    assert n_verified < n_valid


def test_detect_parts_shares_scene_features(rng, monkeypatch):
    """The part axis is batched (VERDICT item 8): scene features are
    extracted once and every part runs inside ONE device program — the
    multi-part path must not re-run prepare_scene per part."""
    import tpu_joints.pipelines.multi as multi

    chord, _ = cylinder_points(rng, radius=0.05, height=0.6, n=700, axis="x")
    stub, _ = cylinder_points(rng, radius=0.12, height=0.15, n=700, axis="z")
    banks = {"chord": _bank(chord), "stub": _bank(stub)}
    views, poses, _ = render_views(stub, level=0, resolution=96)
    v = int(np.argmax([w.shape[0] for w in views]))
    scene = make_cloud(views[v][:1024], capacity=CFG.scene_capacity)

    prepare_calls = []
    real_prepare = multi._prepare_jit
    monkeypatch.setattr(
        multi, "_prepare_jit",
        lambda *a, **k: (prepare_calls.append(1), real_prepare(*a, **k))[1])
    device_calls = []
    real_device = multi._detect_parts_device
    monkeypatch.setattr(
        multi, "_detect_parts_device",
        lambda *a, **k: (device_calls.append(1), real_device(*a, **k))[1])

    detect_parts(scene, banks, CFG)
    assert len(prepare_calls) == 1, "features must be extracted once"
    assert len(device_calls) == 1, "all parts must share one device call"


def _organized_two_part_problem():
    """Small two-part problem that is detectable at CPU test scale: the
    knobby joint's {chord+brackets, stub} parts raycast into an organized
    frame; part banks share the FULL joint CAD (the reference's
    shared-stubcad semantics, SHOT_demo.cpp:245). Bare-cylinder parts sit
    below the small-scale detectability knee (every key on a smooth body
    looks alike — the full 640×480 / 42-view shape is exercised by
    bench.py's two-part section on TPU); the brackets give the chord part
    distinctive descriptors the way the full-scale statistics do."""
    from tpu_joints.core.cloud import bucket_size

    from tests.util import knobby_joint_parts, knobby_joint_primitives

    rng = np.random.default_rng(7)
    parts = knobby_joint_parts(rng, n_chord=1200, n_stub=800, n_knob=300)
    full = np.concatenate([parts["chord"], parts["stub"]])

    part_views = {}
    for name in ("chord", "stub"):
        views, poses, _ = render_views(parts[name], level=0, resolution=64)
        part_views[name] = (views, poses)
    vc = bucket_size(max(max(v.shape[0] for v in vs)
                         for vs, _ in part_views.values()))
    banks = {
        name: build_bank(
            full, views=vs, poses=ps, view_capacity=vc,
            descriptor="shot", descr_radius=0.06, rf_radius=0.06,
            rf_k_max=128, frames="board", sampling_radius=0.02,
            normal_k=16, k_max=96, surface_leaf=0.01,
            key_capacity=48, icp_capacity=512)
        for name, (vs, ps) in part_views.items()
    }
    return banks, knobby_joint_primitives()


def test_detect_parts_organized_matches_per_part_runs():
    """Flagship reference shape ({chord, stub} × views on a raw organized
    frame, SHOT_demo.cpp:430-461) through the fused single-dispatch
    multi-part entry.

    Matching, grouping and the tier-1 refinement are per-view independent,
    so the pooled run's part-p candidate slice must EQUAL a single-part
    run on bank p alone (same selected views, same tier-1 poses/fitness).
    This pins the per-part top-C pooling exactly; full-scale detection
    QUALITY of the two-part search (42 views/part at 640×480) is asserted
    by bench.py's two-part section on real TPU hardware — at this test's
    small scale bare-cylinder part banks sit below the detectability knee
    (every key on a smooth body looks alike)."""
    import jax.numpy as jnp

    from tpu_joints.config import DetectionConfig
    from tpu_joints.pipelines import detect_parts_organized
    from tpu_joints.pipelines.detect import detect_organized
    from tpu_joints.serve.depth import raycast_cylinders

    banks, (cylinders, rects) = _organized_two_part_problem()
    ay, ax = np.radians(35.0), np.radians(-20.0)
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]], np.float32)
    T_pose = np.eye(4, dtype=np.float32)
    T_pose[:3, :3] = Rx @ Ry
    T_pose[:3, 3] = [0.02, -0.03, 1.0]

    xyz_img = raycast_cylinders(cylinders, T_pose, width=320, height=240,
                                rects=rects)
    valid = jnp.asarray(np.isfinite(xyz_img).all(axis=-1))
    xyz_img = jnp.asarray(np.nan_to_num(xyz_img))

    Cp = 6
    cfg = DetectionConfig(
        descriptor="shot", descr_rad=0.06, model_ss=0.02, scene_ss=0.03,
        normal_k=16, match_mode="nn", match_threshold=0.25,
        algorithm="hough", rf_frames="board", rf_rad=0.06, rf_k_max=128,
        cg_size=0.05, cg_thresh=3.0,
        icp_iterations=6, icp_point_to_plane=True,
        icp_max_corr_dist=0.02, icp_max_corr_start=0.2,
        final_icp_iterations=4, max_candidates=Cp,
        max_instances_per_view=1, refine_top=2, tier1_rows=512,
        tier1_iterations=4, scene_capacity=2048, scene_key_capacity=192,
        coverage_accept=0.02, k_max=96,
    )
    names, res, n_sel = detect_parts_organized(
        xyz_img, valid, banks, cfg, block=2, half_window=3)
    assert names == ["chord", "stub"]
    Vp = banks["chord"].n_views

    # per-part top-C pooling: slice p must contain only part-p candidates
    cand_parts = np.asarray(res.cand_views) // Vp
    assert (cand_parts[:Cp] == 0).all() and (cand_parts[Cp:] == 1).all()

    # slice p ≡ single-part run on bank p (same frame, same cfg)
    for p, name in enumerate(names):
        solo, _ = detect_organized(xyz_img, valid, banks[name], cfg,
                                   block=2, half_window=3)
        np.testing.assert_array_equal(
            np.asarray(res.cand_views[p * Cp:(p + 1) * Cp]) - p * Vp,
            np.asarray(solo.cand_views),
            err_msg=f"part {name}: candidate views diverge from solo run")
        np.testing.assert_allclose(
            np.asarray(res.cand_poses[p * Cp:(p + 1) * Cp]),
            np.asarray(solo.cand_poses), rtol=0, atol=1e-4,
            err_msg=f"part {name}: tier-1 poses diverge from solo run")


def test_detect_parts_organized_rejects_mixed_models():
    """Shared-CAD semantics are load-bearing (one polish/coverage model in
    the device program): banks carrying different full models must raise."""
    import jax.numpy as jnp
    import pytest

    from tpu_joints.pipelines import detect_parts_organized

    rng = np.random.default_rng(3)
    chord, _ = cylinder_points(rng, radius=0.05, height=0.6, n=700, axis="x")
    stub, _ = cylinder_points(rng, radius=0.12, height=0.15, n=700, axis="z")
    banks = {"chord": _bank(chord), "stub": _bank(stub)}
    img = jnp.zeros((32, 32, 3), jnp.float32)
    valid = jnp.zeros((32, 32), bool)
    with pytest.raises(ValueError, match="share one full CAD"):
        detect_parts_organized(img, valid, banks, CFG)
