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
