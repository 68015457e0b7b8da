"""Multi-part detection: {chord, stub} × views (SURVEY.md §2.1).

Every reference driver iterates two part banks — ``for k in {chord, stub}``
(``SHOT_demo.cpp:430-461``, ``FPFH_demo.cpp:436-467``, ``6Dpose.cpp:391-418``)
— and keeps the best-scoring part.

TPU-native formulation: a part is just *more views*. The part banks are
concatenated along the view axis, scene features are extracted ONCE, and
matching/grouping/refinement run as a single device program over all
parts' views simultaneously:

  - matching: one [Ms, P·V·Mk] MXU matmul (the same call as single-part,
    wider);
  - grouping: the existing per-view vmap, now over P·V views;
  - candidate selection: top-C *per part* (the reference keeps the best
    score per part loop iteration);
  - ICP: all P·C candidates in ONE folded-row batch
    (``recognize.icp.icp_multi`` — never vmap over parts: the chunked
    top-k scan lowers ~90× slower when batched; folding parts into the
    candidate axis keeps the scan unbatched and the matmuls larger);
  - full-CAD polish: each candidate is polished against ITS part's CAD
    model (gathered per candidate from the stacked [P, Ni, 3] models).

Multi-part latency is therefore ≈ single-part latency + the marginal
matmul/ICP width, not P× the pipeline.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import Cloud
from tpu_joints.core.transforms import compose, transform_points
from tpu_joints.modelbank.bank import ModelBank
from tpu_joints.pipelines.detect import (
    DetectionResult,
    SceneFeatures,
    _model_at_capacity,
    _group_all_views,
    _organized_features_jit,
    _prepare_jit,
    _strip_crop,
    _tier_cfg,
    detect_with_features,
    match_bank,
)
from tpu_joints.recognize.hv import verify_hypotheses
from tpu_joints.recognize.icp import icp_multi
from tpu_joints.recognize.obb import oriented_bounding_box


class MultiPartResult(NamedTuple):
    part: str                        # winning part name
    result: DetectionResult          # its detection result
    per_part: Dict[str, DetectionResult]


def _concat_banks(banks: Dict[str, ModelBank]):
    """Stack part banks along the view axis (shapes must match)."""
    names = list(banks)
    first = banks[names[0]]
    shape = first.view_xyz.shape
    for n in names[1:]:
        if banks[n].view_xyz.shape != shape:
            raise ValueError(
                "multi-part banks must share view shapes: "
                f"{shape} vs {banks[n].view_xyz.shape} ({n})")
    cat = ModelBank(
        view_xyz=jnp.concatenate([banks[n].view_xyz for n in names]),
        view_mask=jnp.concatenate([banks[n].view_mask for n in names]),
        key_xyz=jnp.concatenate([banks[n].key_xyz for n in names]),
        key_valid=jnp.concatenate([banks[n].key_valid for n in names]),
        desc=jnp.concatenate([banks[n].desc for n in names]),
        rf=jnp.concatenate([banks[n].rf for n in names]),
        poses=jnp.concatenate([banks[n].poses for n in names]),
        model_xyz=first.model_xyz,   # unused: the polish gathers per part
        model_mask=first.model_mask,
        icp_xyz=jnp.concatenate([banks[n].icp_xyz for n in names]),
        icp_mask=jnp.concatenate([banks[n].icp_mask for n in names]),
        params_hash="|".join(banks[n].params_hash for n in names),
    )
    Ni = first.icp_xyz.shape[1]
    pm = [_model_at_capacity(banks[n], Ni) for n in names]
    part_models = jnp.stack([x for x, _ in pm])       # [P, Ni, 3]
    part_models_mask = jnp.stack([m for _, m in pm])  # [P, Ni]
    return names, cat, part_models, part_models_mask


@functools.partial(jax.jit, static_argnames=("cfg", "n_parts"))
def _detect_parts_device(
    feats: SceneFeatures,
    cat: ModelBank,
    part_models: jnp.ndarray,
    part_models_mask: jnp.ndarray,
    cfg: DetectionConfig,
    n_parts: int,
):
    """One device program: match → group → per-part top-C → one batched
    ICP → per-part full-CAD polish → per-part winners.

    Returns a pytree of per-part stacked results (leading axis P).
    """
    P = n_parts
    Vt = cat.desc.shape[0]          # P·V concatenated views
    V = Vt // P
    Pi = cfg.max_instances_per_view
    C = min(cfg.max_candidates, V * Pi)

    with jax.named_scope("match_bank"):
        corrs = match_bank(feats.desc, feats.desc_valid, cat.desc,
                           cat.key_valid, cfg)
    with jax.named_scope("grouping"):
        inst = _group_all_views(feats, cat, corrs, cfg)

    votes = jnp.where(inst.valid, inst.votes, -1.0).reshape(P, V * Pi)
    top_votes, top_flat = jax.lax.top_k(votes, C)     # [P, C]
    local_view = top_flat // Pi                       # [P, C] within part
    gview = local_view + V * jnp.arange(P, dtype=top_flat.dtype)[:, None]
    cand_valid = (top_votes > 0.0).reshape(P * C)
    gv = gview.reshape(P * C)
    cand_init = inst.poses.reshape(Vt * Pi, 4, 4)[
        (top_flat + (V * Pi) * jnp.arange(P)[:, None]).reshape(P * C)]
    cand_ncorrs = inst.n_corrs.reshape(Vt * Pi)[
        (top_flat + (V * Pi) * jnp.arange(P)[:, None]).reshape(P * C)]

    with jax.named_scope("icp_refine"):
        cand_poses, cand_fitness = icp_multi(
            cat.icp_xyz[gv], cat.icp_mask[gv], feats.cloud, cand_init,
            iterations=cfg.icp_iterations,
            max_corr_dist=cfg.icp_max_corr_dist,
            max_corr_start=cfg.icp_max_corr_start, chunk=2048,
            point_to_plane=cfg.icp_point_to_plane,
            target_normals=feats.normals if cfg.icp_point_to_plane else None,
            allow_pallas=cfg.icp_allow_pallas,
        )
    cand_fitness = jnp.where(cand_valid, cand_fitness, jnp.float32(3e38))

    # hypothesis verification over the POOLED P·C candidates (the
    # reference runs GO-HV once over all registered instances regardless
    # of which part loop produced them, SHOT_hypothesis.cpp:632-651);
    # P·C > 16 takes verify_hypotheses' greedy local-search path
    if cfg.hv_enabled:
        inst_xyz = jax.vmap(transform_points)(cat.view_xyz[gv], cand_poses)
        cand_verified = verify_hypotheses(
            inst_xyz, cat.view_mask[gv], cand_valid, feats.cloud,
            inlier_threshold=cfg.hv_inlier_threshold,
            outlier_regularizer=cfg.hv_regularizer,
            chunk=1024,
            occlusion_threshold=cfg.hv_occlusion_threshold,
        )
    else:
        cand_verified = cand_valid

    # full-CAD ranking/polish against each candidate's OWN part model
    full_cands = jax.vmap(compose)(cand_poses, cat.poses[gv])
    part_of = jnp.repeat(jnp.arange(P), C)            # [P*C]
    if cfg.select_by_model_fitness or cfg.final_icp_iterations > 0:
        with jax.named_scope("full_model_polish"):
            polished, model_fit = icp_multi(
                part_models[part_of], part_models_mask[part_of],
                feats.cloud, full_cands,
                iterations=cfg.final_icp_iterations,
                max_corr_dist=cfg.icp_max_corr_dist,
                max_corr_start=cfg.icp_max_corr_start, chunk=2048,
                point_to_plane=cfg.final_point_to_plane,
                target_normals=feats.normals,
                allow_pallas=cfg.icp_allow_pallas,
            )
        effective = jnp.where(cand_valid & cand_verified, model_fit,
                              jnp.float32(3e38))
        use_model = cfg.select_by_model_fitness
    else:
        polished, model_fit = full_cands, cand_fitness
        effective = jnp.where(cand_verified, cand_fitness, jnp.float32(3e38))
        use_model = False

    # per-part winner (the reference's per-loop best tracking)
    eff_p = effective.reshape(P, C)
    best = jnp.argmin(eff_p, axis=1)                  # [P]
    flat_best = best + C * jnp.arange(P)
    view_pose = cand_poses[flat_best]
    fitness = cand_fitness[flat_best]
    if cfg.final_icp_iterations > 0:
        full_pose = polished[flat_best]
        full_fitness = model_fit[flat_best]
        accepted = full_fitness < cfg.final_accept_fitness
    else:
        full_pose = full_cands[flat_best]
        full_fitness = model_fit[flat_best] if use_model else fitness
        accepted = fitness < cfg.accept_fitness
    accepted = accepted & cand_valid[flat_best] & cand_verified[flat_best]

    win_gv = gv[flat_best]
    aligned_xyz = jax.vmap(transform_points)(cat.view_xyz[win_gv], view_pose)

    def obb_one(xyz, mask):
        return oriented_bounding_box(
            Cloud(xyz=xyz, mask=mask, rgb=jnp.zeros_like(xyz)))

    box = jax.vmap(obb_one)(aligned_xyz, cat.view_mask[win_gv])

    return dict(
        full_pose=full_pose, view_pose=view_pose, fitness=fitness,
        full_fitness=full_fitness, accepted=accepted,
        view_idx=local_view.reshape(P * C)[flat_best],
        n_corrs=cand_ncorrs[flat_best],
        cand_poses=cand_poses.reshape(P, C, 4, 4),
        cand_fitness=cand_fitness.reshape(P, C),
        cand_views=local_view,
        cand_valid=cand_valid.reshape(P, C),
        cand_verified=cand_verified.reshape(P, C),
        obb=box,
        correspondences=jnp.sum(
            corrs.valid.reshape(P, V, -1).astype(jnp.int32), axis=(1, 2)),
        scene_points=feats.cloud.count(),
        scene_keypoints=feats.keys.count(),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block", "half_window", "n_parts"))
def _organized_detect_parts_jit(
    xyz_img, valid, cat, cfg, block, half_window, crop_lo, crop_hi,
    viewpoint, n_parts):
    """Single-dispatch fused program: organized ingest (+ lattice crop
    chain) → features → the pooled multi-part match/refine
    (``detect_with_features(n_parts=P)``)."""
    feats, n_sel = _organized_features_jit.__wrapped__(
        xyz_img, valid, cfg, block, half_window, crop_lo, crop_hi, viewpoint)
    res = detect_with_features(feats, cat, _strip_crop(cfg), n_parts=n_parts)
    return res, n_sel


def detect_parts_organized(
    xyz_img,
    valid,
    banks: Dict[str, ModelBank],
    cfg: DetectionConfig = DetectionConfig(),
    block: int = 4,
    half_window: int = 5,
    crop_lo=None,
    crop_hi=None,
    viewpoint: Optional[jnp.ndarray] = None,
):
    """Raw organized frame → best pose over SEVERAL part banks, fused.

    The reference's flagship shape: every driver loops ``{chord, stub} ×
    42 views`` against one scene (``SHOT_demo.cpp:430-461``,
    ``FPFH_demo.cpp:436-467``) and composes/gates the winner against the
    FULL joint CAD (``stubcad.pcd``, ``SHOT_demo.cpp:245, :641-686``).
    TPU-native: the part banks concatenate along the view axis and the
    whole two-part search — ingest, features, one [Ms, P·V·Mk] match
    matmul, grouping over P·V views, per-part top-C candidate selection,
    pooled two-tier ICP + coverage ranking/acceptance — runs as ONE device
    program (``detect_with_features(n_parts=P)``).

    Unlike :func:`detect_parts` (which polishes each candidate against its
    own part's CAD and therefore supports per-part acceptance), this entry
    mirrors the reference's shared-CAD semantics: all part banks must
    carry the SAME full model cloud (build each with
    ``build_bank(full_joint_xyz, views=part_views, poses=part_poses)``),
    and the full two-tier/coverage machinery of the single-part pipeline
    applies unchanged.

    Returns ``(part_names, DetectionResult, n_selected)``; the winner's
    part is ``part_names[int(res.view_idx) // views_per_part]`` and each
    candidate's part is ``res.cand_views // views_per_part``.
    """
    names, cat = _cat_for_parts(banks)
    cfg = _tier_cfg(cat, cfg)
    res, n_sel = _organized_detect_parts_jit(
        xyz_img, valid, cat, cfg, block, half_window, crop_lo, crop_hi,
        viewpoint, len(names))
    return names, res, n_sel


# concatenated-bank cache keyed by the part banks' object identities: the
# concat (11 device ops) and the shared-CAD equality check (a device→host
# fetch — a full control-channel roundtrip under a remote TPU attachment,
# ~30 ms) must run once per bank set, NOT once per frame. Identity, not
# params_hash: two banks built from different part views share a hash
# (views content isn't hashed). The cached entry holds the source banks,
# which also pins their ids — a handful of entries per process.
_CAT_CACHE: Dict[tuple, tuple] = {}


def _cat_for_parts(banks: Dict[str, ModelBank]):
    import numpy as np

    key = tuple((n, id(banks[n])) for n in banks)
    hit = _CAT_CACHE.get(key)
    if hit is not None:
        return hit[:2]
    names, cat, _, _ = _concat_banks(banks)
    first = banks[names[0]]
    for n in names[1:]:
        if not np.array_equal(np.asarray(banks[n].model_xyz),
                              np.asarray(first.model_xyz)):
            raise ValueError(
                "detect_parts_organized requires all part banks to share "
                "one full CAD model (the reference's stubcad.pcd); build "
                "each part bank with the full joint as model_xyz and the "
                "part's rendered views as views=/poses=. For per-part CAD "
                "semantics use detect_parts.")
    _CAT_CACHE[key] = (names, cat, tuple(banks.values()))
    return names, cat


def detect_parts(
    scene: Cloud,
    banks: Dict[str, ModelBank],
    cfg: DetectionConfig = DetectionConfig(),
    viewpoint: Optional[jnp.ndarray] = None,
) -> MultiPartResult:
    """Detect every part bank in the scene; return the best-fitness part.

    Scene features are extracted once; all parts run in ONE device program
    (see module docstring). Acceptance stays per-part (a scene may contain
    any subset of parts — inspect ``per_part`` for all of them, as the
    reference prints every instance it finds).

    ``cfg.refine_top`` (two-tier refinement) is a single-part detect
    optimization and is ignored here: every candidate gets the full
    refinement budget (per-part candidate fields are already small).
    ``cfg.rank_scene_coverage`` is likewise not applied (parts rank by
    full-model fitness); ``cfg.coverage_accept`` is an ACCEPTANCE gate and
    silently skipping it would change what "accepted" means — it raises.
    """
    if cfg.coverage_accept > 0.0:
        raise ValueError(
            "coverage_accept is not supported by detect_parts (no scene "
            "coverage stage); use the single-part detect pipeline or set "
            "coverage_accept=0")
    if not banks:
        raise ValueError("no part banks given")
    names, cat, part_models, part_models_mask = _concat_banks(banks)
    feats = _prepare_jit(scene, cfg, viewpoint)
    out = _detect_parts_device(feats, cat, part_models, part_models_mask,
                               cfg, len(names))

    per_part: Dict[str, DetectionResult] = {}
    for p, name in enumerate(names):
        per_part[name] = DetectionResult(
            full_pose=out["full_pose"][p],
            view_pose=out["view_pose"][p],
            fitness=out["fitness"][p],
            full_fitness=out["full_fitness"][p],
            accepted=out["accepted"][p],
            view_idx=out["view_idx"][p],
            n_corrs=out["n_corrs"][p],
            cand_poses=out["cand_poses"][p],
            cand_fitness=out["cand_fitness"][p],
            cand_views=out["cand_views"][p],
            cand_valid=out["cand_valid"][p],
            cand_verified=out["cand_verified"][p],
            obb=jax.tree_util.tree_map(lambda a: a[p], out["obb"]),
            metrics={
                "scene_points": out["scene_points"],
                "scene_keypoints": out["scene_keypoints"],
                "correspondences": out["correspondences"][p],
            },
        )

    def score(res: DetectionResult) -> float:
        f = float(res.full_fitness)
        return f if bool(np.any(np.asarray(res.cand_valid))) else 3e38

    best = min(per_part, key=lambda n: score(per_part[n]))
    return MultiPartResult(part=best, result=per_part[best], per_part=per_part)
