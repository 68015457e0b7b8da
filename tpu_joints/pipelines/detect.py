"""End-to-end 6D pose detection pipeline — layer L6 (SURVEY.md §3.1-3.2).

Reproduces the reference's driver programs (``SHOT.cpp:204-523``,
``SHOT_demo.cpp``, ``6Dpose.cpp``) as one jitted function:

  scene → [segment] → normals → keypoints → descriptors (+LRFs)
        → match against ALL bank views in one tiled matmul
        → Hough/GC grouping vmapped over views
        → top candidates → ICP refine → best instance by fitness
        → full-CAD pose composition with the view's ground-truth T_org
        → [global hypothesis verification] → OBB

The reference iterates 42 views with per-view disk loads and early-exit
flags (``SHOT.cpp:239-265``, ``l=54`` break at ``:521``); TPU-style, all
views are matched and grouped *simultaneously* (compute-all, select-best —
SURVEY.md §7 'data-dependent control flow'), which is also what makes a
batched multi-scene mode trivial (`vmap` over scenes, shard over a mesh).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import Cloud
from tpu_joints.core.transforms import compose
from tpu_joints.features.fpfh import compute_fpfh
from tpu_joints.features.lrf import board_lrf, shot_lrf
from tpu_joints.features.normals import estimate_normals
from tpu_joints.features.shot import compute_shot
from tpu_joints.filters import compact_cloud, uniform_sample_mask
from tpu_joints.modelbank.bank import ModelBank
from tpu_joints.neighbors import radius_neighbors
from tpu_joints.recognize.gc import gc_group
from tpu_joints.recognize.hough import Instances, hough_group
from tpu_joints.recognize.hv import verify_hypotheses
from tpu_joints.recognize.icp import icp_multi, icp_multi_capped
from tpu_joints.recognize.matching import Correspondences
from tpu_joints.recognize.obb import OBB, oriented_bounding_box

_HI = jax.lax.Precision.HIGHEST


class SceneFeatures(NamedTuple):
    cloud: Cloud           # (possibly segmentation-cropped) scene
    normals: jnp.ndarray   # [N, 3]
    keys: Cloud            # [Ms] keypoints
    desc: jnp.ndarray      # [Ms, D]
    desc_valid: jnp.ndarray
    rf: jnp.ndarray        # [Ms, 3, 3]
    rf_ok: jnp.ndarray


class DetectionResult(NamedTuple):
    """Best instance + all refined candidates (compute-all, select-best)."""

    full_pose: jnp.ndarray       # [4, 4] CAD model → scene (pose · T_org)
    view_pose: jnp.ndarray       # [4, 4] view cloud → scene (icp ∘ hough)
    fitness: jnp.ndarray         # PCL-style mean squared NN distance
    full_fitness: jnp.ndarray    # fitness of the FULL CAD at full_pose
                                 # (the reference's score2, SHOT_demo.cpp:669)
    accepted: jnp.ndarray        # fitness < cfg.accept_fitness
    view_idx: jnp.ndarray        # winning bank view
    n_corrs: jnp.ndarray         # supporting correspondences of the winner
    # all refined candidates (C = cfg.max_candidates):
    cand_poses: jnp.ndarray      # [C, 4, 4] view→scene
    cand_fitness: jnp.ndarray    # [C]
    cand_views: jnp.ndarray      # [C]
    cand_valid: jnp.ndarray      # [C]
    cand_verified: jnp.ndarray   # [C] HV mask (all-True when HV disabled)
    obb: OBB                     # box around the aligned winning view
    metrics: dict                # per-stage counts (traced scalars)


def metrics_to_json(metrics: dict) -> dict:
    """DetectionResult.metrics → JSON-safe dict (one shared conversion for
    the CLI ``--json`` line and the server payload).

    Scalars become floats, small per-candidate vectors (cand_coverage /
    cand_unexplained / cand_tier2, …) become lists. The [C, 4, 4]
    candidate pose table stays out: consumers get the GOOD subset through
    ``good_instances`` / the server's ``instances`` field, not a 256-float
    dump per response line.
    """
    import numpy as np

    return {k: (float(a) if a.ndim == 0 else np.asarray(a).tolist())
            for k, a in ((k, np.asarray(v)) for k, v in metrics.items())
            if k != "cand_full_poses"}


def prepare_scene(
    scene: Cloud, cfg: DetectionConfig,
    viewpoint: Optional[jnp.ndarray] = None,
    normals: Optional[jnp.ndarray] = None,
    curvature: Optional[jnp.ndarray] = None,
    key_select: Optional[jnp.ndarray] = None,
) -> SceneFeatures:
    """Normals → [region-growing crop] → keypoints → descriptors + LRFs.

    Pass ``normals``/``curvature`` to skip estimation — the organized-cloud
    front end (``pipelines.ingest.ingest_organized``) already computed them
    at stencil cost on the sensor grid (A9 fast path). ``key_select``
    (bool[N]) supplies a precomputed keypoint mask — the organized front
    end's lattice detector (cfg.keypoints == "lattice") selects keys with
    sensor-grid stencils instead of the two working-set sorts the generic
    uniform sampler pays.
    """
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)
    with jax.named_scope("normals"):
        if normals is None or curvature is None:
            if cfg.normal_radius > 0.0:
                from tpu_joints.features.normals import estimate_normals_radius

                # FPFH_demo.cpp:405-428: radius-support normals
                normals, curvature = estimate_normals_radius(
                    scene, radius=cfg.normal_radius, k_max=cfg.k_max,
                    viewpoint=viewpoint)
            elif cfg.normal_anchors > 0:
                from tpu_joints.features.normals import estimate_normals_anchored

                normals, curvature = estimate_normals_anchored(
                    scene, k=cfg.normal_k, anchors=cfg.normal_anchors,
                    viewpoint=viewpoint)
            else:
                # allow_pallas=False: the pipeline keeps exactly ONE Mosaic
                # program (the ICP k=1 kernel) per process — a distinct
                # kNN program alternating with it re-triggers the TPU
                # runtime re-execution fault (docs/PERFORMANCE.md)
                normals, curvature = estimate_normals(
                    scene, k=cfg.normal_k, viewpoint=viewpoint,
                    allow_pallas=False)

    if cfg.remove_plane:
        from tpu_joints.segment.sac import sac_plane

        with jax.named_scope("remove_plane"):
            # deterministic hypothesis draw: same scene → same crop
            plane = sac_plane(scene, normals, jax.random.PRNGKey(0),
                              n_hypotheses=256,
                              distance_threshold=cfg.plane_dist)
            n_valid = jnp.sum(scene.mask.astype(jnp.int32))
            dominant = plane.score >= (
                cfg.plane_min_fraction * n_valid.astype(jnp.float32))
            scene = scene.with_mask(
                scene.mask & ~(plane.inliers & dominant))

    if cfg.segment_scene:
        from tpu_joints.segment import cluster_curvature_filter, region_growing

        if cfg.rg_backend == "voxel":
            # bounded-cost backend for unorganized/file-driven scenes:
            # no O(N²) kNN graph (see segment.voxel module doc)
            from tpu_joints.segment.voxel import region_growing_voxel

            clusters = region_growing_voxel(
                scene, normals, curvature,
                leaf=cfg.rg_voxel_leaf or 2.0 * cfg.scene_ss,
                grid=cfg.rg_voxel_grid,
                smoothness_deg=cfg.rg_smoothness_deg,
                curvature_threshold=cfg.rg_curvature,
                min_cluster_size=cfg.rg_min_cluster,
                pitch=cfg.rg_voxel_pitch,
            )
        elif cfg.rg_backend == "graph":
            clusters = region_growing(
                scene, normals, curvature,
                k=min(30, cfg.normal_k),
                smoothness_deg=cfg.rg_smoothness_deg,
                curvature_threshold=cfg.rg_curvature,
                min_cluster_size=cfg.rg_min_cluster,
                max_edge=cfg.rg_max_edge,
            )
        else:
            raise ValueError(f"unknown rg_backend {cfg.rg_backend!r}")
        keep = cluster_curvature_filter(
            clusters, curvature, scene.mask, cfg.cluster_max_curvature
        )
        scene = scene.with_mask(keep)

    if key_select is not None:
        keep = key_select & scene.mask
    elif cfg.keypoints == "iss":
        from tpu_joints.features.iss import iss_keypoints

        # PCL's commented alternative: salient radius 6·res, non-max 4·res
        # (SHOT.cpp:334-335) — here parameterized off scene_ss
        keep = iss_keypoints(
            scene, salient_radius=3.0 * cfg.scene_ss,
            non_max_radius=2.0 * cfg.scene_ss,
            gamma_21=cfg.iss_gamma_21, gamma_32=cfg.iss_gamma_32,
            k_max=cfg.k_max,
        )
    elif cfg.keypoints == "lattice":
        # lattice keys exist only where a sensor grid does — the organized
        # front end supplies them (detect_organized); the unorganized path
        # has no lattice to select on
        raise ValueError(
            'keypoints="lattice" requires the organized front end '
            "(detect_organized / ingest_organized_* with key_group > 0)")
    else:
        keep = uniform_sample_mask(scene, cfg.scene_ss)
    keys, kidx = compact_cloud(scene, keep, cfg.scene_key_capacity)

    # one support gather can feed BOTH the descriptor and the voting
    # frames when they share radius and width — the duplicate k=256
    # gather was the single most expensive op in the serving prepare
    # stage (docs/PERFORMANCE.md marginal breakdown)
    share_support = (cfg.descriptor == "shot" and cfg.rf_frames == "board"
                     and cfg.rf_rad == cfg.descr_rad
                     and cfg.rf_k_max == cfg.k_max)
    shared = None
    if share_support:
        sidx, swithin, _ = radius_neighbors(
            keys.xyz, scene.xyz, cfg.descr_rad, cfg.k_max,
            source_mask=scene.mask)
        shared = (sidx, swithin)

    if cfg.descriptor == "shot":
        desc, rf, valid = compute_shot(keys, scene, normals, radius=cfg.descr_rad,
                                       k_max=cfg.k_max, neighbors=shared)
        rf_ok = valid
        need_rf = cfg.rf_frames != "shot"
    elif cfg.descriptor == "fpfh":
        fk = cfg.fpfh_k_max or cfg.k_max
        if cfg.fpfh_surface == "keys":
            # the reference's FPFH parameterization: the keypoint cloud is
            # its own search surface (FPFH_demo.cpp:423-428 — VoxelGrid
            # keypoints as input, no setSearchSurface). Key normals come
            # from the working-set estimate rather than PCL's re-estimated
            # radius-0.15 normals on the sparse keys — same on both the
            # bank and scene sides, so descriptor spaces stay comparable.
            desc, valid = compute_fpfh(keys, normals[kidx], keys,
                                       normals[kidx], radius=cfg.descr_rad,
                                       k_max=fk)
        elif cfg.fpfh_surface == "cloud":
            desc, valid = compute_fpfh(keys, normals[kidx], scene, normals,
                                       radius=cfg.descr_rad, k_max=fk)
        else:
            raise ValueError(f"unknown fpfh_surface {cfg.fpfh_surface!r}")
        rf = rf_ok = None
        need_rf = True
    else:
        raise ValueError(f"unknown descriptor {cfg.descriptor!r}")

    if need_rf:
        # Hough voting frames, computed at rf_rad on the raw scene (must use
        # the same radius as the bank side or votes scatter across bins).
        if shared is not None:
            nidx, nwithin = shared
        else:
            nidx, nwithin, _ = radius_neighbors(
                keys.xyz, scene.xyz, cfg.rf_rad, cfg.rf_k_max,
                source_mask=scene.mask)
        nvalid = nwithin & keys.mask[:, None]
        if cfg.rf_frames == "board":
            # the reference's Hough frames (BOARD, SHOT.cpp:441-453)
            rf, rf_ok = board_lrf(keys.xyz, normals[kidx], scene.xyz[nidx],
                                  normals[nidx], nvalid, cfg.rf_rad)
        elif cfg.rf_frames == "shot":
            rf, rf_ok = shot_lrf(keys.xyz, scene.xyz[nidx], nvalid, cfg.rf_rad)
        else:
            raise ValueError(f"unknown rf_frames {cfg.rf_frames!r}")

    return SceneFeatures(cloud=scene, normals=normals, keys=keys,
                         desc=desc, desc_valid=valid, rf=rf, rf_ok=rf_ok)


def _model_at_capacity(bank: ModelBank, n: int):
    """The full CAD cloud stride-subsampled/padded to exactly ``n`` lanes —
    the same capacity as the per-view ICP clouds, so the full-model polish
    reuses the candidate refinement's NN geometry (one kernel program per
    executable; see detect_with_features)."""
    Nm = bank.model_xyz.shape[0]
    stride = max(1, Nm // n)
    xyz = bank.model_xyz[::stride][:n]
    mask = bank.model_mask[::stride][:n]
    pad = n - xyz.shape[0]
    if pad > 0:
        xyz = jnp.concatenate([xyz, jnp.full((pad, 3), 1.0e6, xyz.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return xyz, mask


def match_bank(
    scene_desc: jnp.ndarray,
    scene_valid: jnp.ndarray,
    bank_desc: jnp.ndarray,
    bank_valid: jnp.ndarray,
    cfg: DetectionConfig,
) -> Correspondences:
    """Per-view matching as one MXU matmul.

    The reference matches the scene against one view at a time inside its
    42-iteration loop (``SHOT.cpp:403-424``); here the [Ms, V·Mk] distance
    matrix is computed once and reduced per view.

    Returns a Correspondences pytree with leading view axis: model_idx
    int32[V, Ms] (indices into that view's keypoints), valid[V, Ms],
    dist_sq[V, Ms].
    """
    V, Mk, D = bank_desc.shape
    flat = bank_desc.reshape(V * Mk, D)
    s2 = jnp.sum(scene_desc * scene_desc, axis=-1, keepdims=True)  # [Ms,1]
    b2 = jnp.sum(flat * flat, axis=-1)  # [V*Mk]
    d = s2 + b2[None, :] - 2.0 * jnp.dot(scene_desc, flat.T, precision=_HI)
    d = jnp.maximum(d, 0.0).reshape(-1, V, Mk)
    d = jnp.where(bank_valid[None, :, :], d, jnp.float32(3e38))

    if cfg.match_mode == "nn":
        idx = jnp.argmin(d, axis=-1)  # [Ms, V]
        d1 = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
        ok = scene_valid[:, None] & (d1 < cfg.match_threshold)
    elif cfg.match_mode == "ratio":
        neg2, idx2 = jax.lax.top_k(-d, 2)  # [Ms, V, 2]
        d1, d2 = -neg2[..., 0], -neg2[..., 1]
        idx = idx2[..., 0]
        ok = (
            scene_valid[:, None]
            & (d1 <= cfg.ratio * cfg.ratio * jnp.maximum(d2, 1e-20))
            & (d2 < 1e30)
        )
    else:
        raise ValueError(f"unknown match mode {cfg.match_mode!r}")
    return Correspondences(
        model_idx=jnp.swapaxes(idx, 0, 1).astype(jnp.int32),
        valid=jnp.swapaxes(ok, 0, 1),
        dist_sq=jnp.swapaxes(d1, 0, 1),
    )


def _group_all_views(
    feats: SceneFeatures, bank: ModelBank, corrs: Correspondences,
    cfg: DetectionConfig,
) -> Instances:
    """Correspondence grouping vmapped over the view axis."""
    return _group_views_arrays(feats, bank.key_xyz, bank.rf,
                               bank.key_valid, corrs, cfg)


def _group_views_arrays(
    feats: SceneFeatures,
    bank_key_xyz: jnp.ndarray,
    bank_rf: jnp.ndarray,
    bank_key_valid: jnp.ndarray,
    corrs: Correspondences,
    cfg: DetectionConfig,
) -> Instances:
    """Array-argument grouping (no ModelBank container): the shard_map TP
    formulation (``distributed.batch``) passes per-device view shards."""
    if cfg.algorithm == "hough":
        def per_view(mk, mrf, mvalid, c):
            return hough_group(
                feats.keys.xyz, feats.rf, feats.rf_ok,
                mk, mrf, mvalid, mvalid, c,
                bin_size=cfg.cg_size, threshold=cfg.cg_thresh,
                max_instances=cfg.max_instances_per_view,
                use_distance_weight=cfg.use_distance_weight,
                split_rotation_modes=cfg.split_rotation_modes,
            )
    elif cfg.algorithm == "gc":
        def per_view(mk, mrf, mvalid, c):
            return gc_group(
                feats.keys.xyz, mk, mvalid, c,
                gc_size=cfg.cg_size, gc_threshold=cfg.cg_thresh,
                max_instances=cfg.max_instances_per_view,
            )
    else:
        raise ValueError(f"unknown grouping algorithm {cfg.algorithm!r}")
    return jax.vmap(per_view)(bank_key_xyz, bank_rf, bank_key_valid, corrs)


_prepare_jit = functools.partial(jax.jit, static_argnames=("cfg",))(prepare_scene)
_detect_features_jit = None  # set below, after detect_with_features is defined


def detect(
    scene: Cloud,
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
    viewpoint: Optional[jnp.ndarray] = None,
    scene_normals: Optional[jnp.ndarray] = None,
    scene_curvature: Optional[jnp.ndarray] = None,
    sync: bool = False,
) -> DetectionResult:
    """One scene → best 6D pose (plus all candidates).

    Two jitted stages: feature extraction, then match/refine. Splitting
    measures faster than the fused megajit (196 vs 261 ms at bench scale)
    and keeps each Mosaic-kernel executable smaller.

    ``sync=True`` blocks on the result inside the call and retries the
    chain once on a TPU INVALID_ARGUMENT — that recovers transient
    tunnel/runtime blips (the request server uses this; a latency-critical
    caller should not: under a remote TPU attachment an extra
    ``block_until_ready`` is a full control-channel roundtrip, measured
    ~30 ms on v5e-via-tunnel, even though the same call on local devices is
    free). It does NOT recover the known Mosaic multi-program re-execution
    fault (that one poisons the whole context — see
    neighbors.bruteforce._PALLAS_MAXK and docs/PERFORMANCE.md), which is
    why the default kernel policy is the empirically stable minimal set
    rather than Pallas-everywhere. Set TPU_JOINTS_DISABLE_PALLAS=1 to force
    pure-XLA kernels.
    """
    cfg = _tier_cfg(bank, cfg)   # no-model banks: two-tier off (see helper)

    def run():
        feats = _prepare_jit(scene, cfg, viewpoint, scene_normals,
                             scene_curvature)
        out = _detect_features_jit(feats, bank, cfg)
        if sync:
            jax.block_until_ready(out.fitness)  # surface async TPU faults
        return out

    if not sync:
        return run()
    try:
        return run()
    except jax.errors.JaxRuntimeError as e:  # pragma: no cover - HW fault
        if "INVALID_ARGUMENT" not in str(e):
            raise
        return run()


def good_instances(
    res: DetectionResult,
    cfg: DetectionConfig,
    min_separation: float = 0.05,
):
    """All distinct GOOD instances in a detection — the multi-instance
    verdict list of the reference (``SHOT_hypothesis.cpp:653-721`` prints
    "Instance i is GOOD!" per HV-surviving registered instance).

    The pipeline is compute-all/select-best over ``cfg.max_candidates``
    refined candidates; in a multi-instance scene each physical instance
    surfaces as its own Hough peak (set ``cfg.max_instances_per_view >= 2``
    so one view's accumulator may yield several). This host-side helper
    extracts every candidate that is valid, HV-verified, and passes the
    same fitness gate the winner is held to, then greedy-dedupes by
    location: two candidates whose composed translations sit within
    ``min_separation`` metres claim the same physical spot and are one
    instance (the better-fitness one is kept — this also collapses a
    symmetry flip of an already-kept pose rather than double-counting it).

    Returns a best-first list of dicts with keys ``pose`` (composed
    CAD→scene, [4, 4] numpy), ``view_idx``, ``fitness``, ``candidate``.

    Caveats: multi-part results (``pipelines.multi``) carry no candidate
    pose table — they return ``[]`` here (each part already reports
    separately). Under two-tier refinement (``cfg.refine_top > 0``) only
    the tier-2 survivors are eligible — tier-1 poses/fitness/coverage are
    ranking-grade, not acceptance-grade — so set ``refine_top`` to at
    least the number of instances a scene may contain (or 0).
    """
    import numpy as np

    if "cand_full_poses" not in res.metrics:
        return []
    poses = np.asarray(res.metrics["cand_full_poses"])
    has_model = bool(np.asarray(res.metrics.get("has_model", True)))
    # mirror the winner's acceptance quantity EXACTLY (detect gates the
    # best candidate on full-CAD fitness only when a final polish ran on a
    # bank that stores the CAD; otherwise on the view fitness). A stricter
    # gate here would make an accepted detection report zero instances —
    # e.g. the shot_hypothesis preset accepts on view fitness < 1e-3 while
    # full-CAD fitness of TRUE poses sits at the ~4e-3 back-of-CAD floor.
    if cfg.final_icp_iterations > 0 and has_model:
        fitness = np.asarray(res.metrics["cand_full_fitness"])
        gate = cfg.final_accept_fitness
    else:
        fitness = np.asarray(res.cand_fitness)
        gate = cfg.accept_fitness
    ok = (np.asarray(res.cand_valid) & np.asarray(res.cand_verified)
          & (fitness < gate))
    if "cand_tier2" in res.metrics:
        # only acceptance-grade candidates may be reported (see docstring)
        ok &= np.asarray(res.metrics["cand_tier2"])
    # the winner's scene-coverage gate applies to every instance: a flip
    # that passes the fitness gate but cannot explain the scene must not
    # be reported GOOD (detect.py's coverage_accept semantics)
    if (cfg.coverage_accept > 0.0 and has_model
            and "cand_unexplained" in res.metrics):
        ok &= (np.asarray(res.metrics["cand_unexplained"])
               < cfg.coverage_accept)
    views = np.asarray(res.cand_views)
    # greedy order: the same coverage-dominant rank the winner selection
    # uses (coverage + 0.1·fitness) when coverage was computed — full-CAD
    # fitness alone is flip-blind on near-symmetric parts (the occluded
    # back dominates it for true and flipped poses alike), so the
    # location dedup below would keep whichever of true/flip drew the
    # lower noise floor. Fitness-only order is kept for runs without a
    # ranking stage.
    if "cand_coverage" in res.metrics:
        order_metric = (np.asarray(res.metrics["cand_coverage"])
                        + 0.1 * fitness)
    else:
        order_metric = fitness
    kept = []
    for i in np.argsort(order_metric):
        if not ok[i]:
            continue
        T = poses[i]
        if any(np.linalg.norm(T[:3, 3] - k["pose"][:3, 3]) < min_separation
               for k in kept):
            continue
        kept.append({
            "pose": T,
            "view_idx": int(views[i]),
            "fitness": float(fitness[i]),
            "candidate": int(i),
        })
    return kept


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_fused(
    scene: Cloud,
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
    viewpoint: Optional[jnp.ndarray] = None,
) -> DetectionResult:
    """Single-executable variant of :func:`detect` (for vmap/pjit contexts)."""
    feats = prepare_scene(scene, cfg, viewpoint)
    return detect_with_features(feats, bank, cfg)


def detect_with_features(
    feats: SceneFeatures,
    bank: ModelBank,
    cfg: DetectionConfig,
    n_parts: int = 1,
) -> DetectionResult:
    """Match → group → refine → compose against one (sub-)bank.

    Factored out of :func:`detect` so coarse-to-fine policies (the cluster
    tree of ``FPFH_scenes_clustered.cpp``, SURVEY.md A29) can reuse the
    whole chain on gathered view subsets without re-extracting features.

    ``n_parts > 1``: the bank's view axis is a concatenation of that many
    part banks (the reference's ``for k in {chord, stub}`` outer loop,
    ``SHOT_demo.cpp:430-461``) sharing ONE full CAD; candidate selection
    becomes top-``max_candidates`` *per part* so a vote-rich part cannot
    crowd the other out of the refinement pool, and every downstream stage
    (two-tier ICP, coverage ranking, acceptance) runs on the pooled
    ``n_parts · max_candidates`` field unchanged. The winning candidate's
    part is ``view_idx // (V / n_parts)``. See
    ``pipelines.multi.detect_parts_organized`` for the entry that builds
    the concatenated bank.
    """
    with jax.named_scope("match_bank"):
        corrs = match_bank(feats.desc, feats.desc_valid, bank.desc,
                           bank.key_valid, cfg)
    with jax.named_scope("grouping"):
        inst = _group_all_views(feats, bank, corrs, cfg)
    return refine_instances(
        feats, bank, inst, jnp.sum(corrs.valid.astype(jnp.int32)), cfg,
        n_parts=n_parts)


def refine_instances(
    feats: SceneFeatures,
    bank: ModelBank,
    inst: Instances,
    n_corr_total: jnp.ndarray,
    cfg: DetectionConfig,
    n_parts: int = 1,
) -> DetectionResult:
    """Everything after correspondence grouping: candidate selection →
    (two-tier) ICP → HV → full-CAD ranking/coverage → winner + OBB.

    Factored out of :func:`detect_with_features` so the tensor-parallel
    formulation (``distributed.batch.detect_batch`` with a mesh) can run
    matching + grouping inside a ``shard_map`` over the ``model`` axis —
    each device extracts Hough peaks from its own view shard and only the
    small per-view instance tables ([V, P] poses/votes) cross ICI, never
    the ``f32[V, 64³]`` accumulators (docs/PARITY.md §'Measured TP
    communication shape').
    """
    V = inst.votes.shape[0]
    P = cfg.max_instances_per_view
    if V % n_parts:
        raise ValueError(f"bank views ({V}) must split evenly into "
                         f"{n_parts} parts")
    Vp = V // n_parts
    # never ask for more candidates than the instance pool holds (a small
    # bank with max_instances_per_view=1 can have Vp·P < max_candidates)
    Cp = min(cfg.max_candidates, Vp * P)   # candidates PER PART
    C = n_parts * Cp
    votes = jnp.where(inst.valid, inst.votes, -1.0).reshape(n_parts, Vp * P)
    if (cfg.peak_grouped_candidates and cfg.split_rotation_modes
            and P % 2 == 0 and Cp % 2 == 0):
        # peak-grouped cut (see config.peak_grouped_candidates): adjacent
        # row pairs are one translation peak's two rotation modes
        # (recognize.hough.hough_group interleaves them); rank all
        # (view, peak) pairs globally, admit both modes of the top Cp/2
        Kp = Cp // 2
        strength = votes.reshape(n_parts, Vp * P // 2, 2).max(axis=2)
        _, top_pairs = jax.lax.top_k(strength, Kp)             # [n_parts, Kp]
        top_local = (top_pairs[:, :, None] * 2
                     + jnp.arange(2, dtype=top_pairs.dtype)
                     ).reshape(n_parts, Cp)
        top_votes = jnp.take_along_axis(votes, top_local, axis=1)
    elif cfg.view_grouped_candidates and P > 1 and Cp % P == 0:
        # view-grouped cut (see config.view_grouped_candidates): strongest
        # bin selects the view, ALL its bins enter — the flipped bin of
        # the correct view carries the true bin into the field
        Kv = Cp // P
        strength = votes.reshape(n_parts, Vp, P).max(axis=2)   # [n_parts, Vp]
        _, top_views = jax.lax.top_k(strength, Kv)             # [n_parts, Kv]
        top_local = (top_views[:, :, None] * P
                     + jnp.arange(P, dtype=top_views.dtype)
                     ).reshape(n_parts, Cp)
        top_votes = jnp.take_along_axis(votes, top_local, axis=1)
    else:
        top_votes, top_local = jax.lax.top_k(votes, Cp)  # [n_parts, Cp]
    top_flat = (top_local + (Vp * P) * jnp.arange(
        n_parts, dtype=top_local.dtype)[:, None]).reshape(C)
    top_votes = top_votes.reshape(C)
    cand_views = top_flat // P
    cand_valid = top_votes > 0.0
    cand_init = inst.poses.reshape(V * P, 4, 4)[top_flat]
    cand_ncorrs = inst.n_corrs.reshape(V * P)[top_flat]

    # two-tier refinement (cfg.refine_top > 0): every candidate is refined
    # and ranked on a stride-reduced row budget, then only the top
    # ``refine_top`` survivors get the full-budget polish + dense coverage.
    # The NN distance evaluations of this stage dominate the pipeline's
    # device time (~2G point-pairs/frame single-tier at bench shapes); the
    # tier-1 pass runs the identical algorithms at ~1/4 the rows, so the
    # pair count drops ~(C/refine_top)× while tier 2 alone sets the final
    # accuracy. refine_top=0 keeps the strict compute-all shape.
    Ni = bank.icp_xyz.shape[1]
    # two-tier REQUIRES a tier-2 polish (final_icp_iterations > 0): with a
    # rank-only final stage the view ICP would be the only refinement, and
    # striding it would ship coarser poses than single-tier with nothing
    # downstream to recover them
    two_tier = 0 < cfg.refine_top < C and cfg.final_icp_iterations > 0
    stride = max(1, Ni // cfg.tier1_rows) if two_tier else 1
    # tier-1 stages are ranking-only: an optional reduced iteration budget
    # (cfg.tier1_iterations) cuts their sequential NN-round depth — the
    # latency driver of the whole refinement stage — while tier 2 keeps
    # the acceptance-grade budgets
    t1_view_iters = cfg.icp_iterations
    t1_polish_iters = cfg.final_icp_iterations
    if two_tier:
        # per-stage overrides first, the shared tier1_iterations second
        if cfg.tier1_view_iterations > 0:
            t1_view_iters = cfg.tier1_view_iterations
        elif cfg.tier1_iterations > 0:
            t1_view_iters = cfg.tier1_iterations
        if cfg.tier1_polish_iterations > 0:
            t1_polish_iters = cfg.tier1_polish_iterations
        elif cfg.tier1_iterations > 0:
            t1_polish_iters = min(cfg.tier1_iterations,
                                  cfg.final_icp_iterations)
    with jax.named_scope("icp_refine"):
        # all candidates refined in ONE batched ICP: candidate axis folded
        # into the NN query rows (never vmap the chunked top-k scan — see
        # recognize.icp.icp_multi's design note)
        cand_poses, cand_fitness = icp_multi_capped(
            bank.icp_xyz[cand_views][:, ::stride],
            bank.icp_mask[cand_views][:, ::stride],
            feats.cloud, cand_init,
            rows_cap=cfg.icp_rows_per_call,
            iterations=t1_view_iters,
            max_corr_dist=cfg.icp_max_corr_dist,
            max_corr_start=cfg.icp_max_corr_start, chunk=2048,
            point_to_plane=cfg.icp_point_to_plane,
            target_normals=feats.normals if cfg.icp_point_to_plane else None,
            with_fitness=not (two_tier and cfg.tier1_skip_view_fitness),
            allow_pallas=cfg.icp_allow_pallas,
        )
    cand_fitness = jnp.where(cand_valid, cand_fitness, jnp.float32(3e38))

    if cfg.hv_enabled:
        from tpu_joints.core.transforms import transform_points

        def registered(view, T):
            xyz = transform_points(bank.view_xyz[view], T)
            return xyz, bank.view_mask[view]

        inst_xyz, inst_mask = jax.vmap(registered)(cand_views, cand_poses)
        cand_verified = verify_hypotheses(
            inst_xyz, inst_mask, cand_valid, feats.cloud,
            inlier_threshold=cfg.hv_inlier_threshold,
            outlier_regularizer=cfg.hv_regularizer,
            chunk=1024,
            occlusion_threshold=cfg.hv_occlusion_threshold,
        )
        effective_fitness = jnp.where(cand_verified, cand_fitness, jnp.float32(3e38))
    else:
        cand_verified = cand_valid
        effective_fitness = cand_fitness

    # Full-CAD polish + ranking for ALL candidates in one batched ICP (the
    # reference's composed-pose score2 chain + monotone best tracking,
    # SHOT_demo.cpp:641-686). Ranking by the matched view cloud's own
    # fitness is blind to the chord cylinder's slide/spin symmetry — a
    # mostly-chord view can outscore the correct one — so candidates are
    # ranked by how the FULL model fits at the composed pose. The model is
    # stride-subsampled to the views' icp capacity, which makes this call
    # the SAME folded NN geometry (and thus the same Mosaic kernel program)
    # as the candidate refinement above — one kernel program per
    # executable, the empirically safe TPU runtime configuration.
    has_model = jnp.any(bank.model_mask)
    full_cands = jax.vmap(compose)(cand_poses, bank.poses[cand_views])
    if cfg.select_by_model_fitness or cfg.final_icp_iterations > 0:
        C = cand_poses.shape[0]
        Nm = bank.model_xyz.shape[0]
        rows = (Ni + stride - 1) // stride
        m_xyz, m_mask = _model_at_capacity(bank, rows)
        with jax.named_scope("full_model_polish"):
            polished, model_fit = icp_multi_capped(
                jnp.broadcast_to(m_xyz, (C, rows, 3)),
                jnp.broadcast_to(m_mask, (C, rows)),
                feats.cloud, full_cands,
                rows_cap=cfg.icp_rows_per_call,
                iterations=t1_polish_iters,  # 0 = rank only
                max_corr_dist=cfg.icp_max_corr_dist,
                # wide basin early: a mostly-chord winner can sit several cm
                # slid along the cylinder axis, beyond the final gate
                max_corr_start=cfg.icp_max_corr_start, chunk=2048,
                point_to_plane=cfg.final_point_to_plane,
                target_normals=feats.normals,
                allow_pallas=cfg.icp_allow_pallas,
            )
        rank_metric = model_fit
        coverage = unexplained = None
        if cfg.rank_scene_coverage:
            from tpu_joints.recognize.icp import scene_coverage_multi

            # flip discriminator: the scene must be EXPLAINED by the posed
            # model (score2 alone is flip-blind on near-symmetric parts —
            # see scene_coverage_multi). The NN target is a DENSER model
            # subsample than the ICP rows: the unexplained-fraction gate
            # compares scene→model NN distances against a 2 cm threshold,
            # so the model's own sampling tail must sit well inside it —
            # banks store the CAD at up to 8192 shuffled points for exactly
            # this (a 1024-row store put ~8% of on-surface points past
            # 2 cm and tripped the gate on perfect poses). Under two-tier,
            # tier 1 ranks on a 2048-point target (ranking only needs the
            # coverage CONTRAST); the acceptance-grade dense pass runs in
            # tier 2 on the survivors.
            cov_cap = min(Nm, 2048) if two_tier else min(Nm, max(4096, Ni))
            c_xyz, c_mask = _model_at_capacity(bank, cov_cap)
            with jax.named_scope("scene_coverage"):
                coverage, unexplained = scene_coverage_multi(
                    feats.cloud, c_xyz, c_mask, polished,
                    clip=cfg.coverage_clip, chunk=2048,
                    local=cfg.coverage_local)
            # coverage-DOMINANT ranking, model_fit as tiebreak: score2's
            # value is the same back-of-CAD noise floor (~4e-3 m²) for true
            # and flipped poses alike, and its candidate-to-candidate
            # jitter exceeds the coverage separation — an equal-weight sum
            # let a flip win on measured TPU sweeps even with the true
            # pose in the field (cov 8e-5 vs 2e-4, fit jitter ~2e-4)
            rank_metric = coverage + 0.1 * model_fit
        ranked = jnp.where(cand_valid & cand_verified, rank_metric,
                           jnp.float32(3e38))
        if two_tier:
            R = cfg.refine_top
            _, top_r = jax.lax.top_k(-ranked, R)
            m2_xyz, m2_mask = _model_at_capacity(bank, Ni)
            with jax.named_scope("tier2_polish"):
                polished2, fit2 = icp_multi_capped(
                    jnp.broadcast_to(m2_xyz, (R, Ni, 3)),
                    jnp.broadcast_to(m2_mask, (R, Ni)),
                    feats.cloud, polished[top_r],
                    rows_cap=cfg.icp_rows_per_call,
                    iterations=cfg.final_icp_iterations,
                    max_corr_dist=cfg.icp_max_corr_dist,
                    max_corr_start=cfg.icp_max_corr_start, chunk=2048,
                    point_to_plane=cfg.final_point_to_plane,
                    target_normals=feats.normals,
                    allow_pallas=cfg.icp_allow_pallas,
                )
            rank2 = fit2
            if cfg.rank_scene_coverage:
                c2_xyz, c2_mask = _model_at_capacity(
                    bank, min(Nm, max(4096, Ni)))
                with jax.named_scope("tier2_coverage"):
                    coverage2, unexplained2 = scene_coverage_multi(
                        feats.cloud, c2_xyz, c2_mask, polished2,
                        clip=cfg.coverage_clip, chunk=2048,
                        local=cfg.coverage_local)
                rank2 = coverage2 + 0.1 * fit2
                coverage = coverage.at[top_r].set(coverage2)
                unexplained = unexplained.at[top_r].set(unexplained2)
            rank2 = jnp.where((cand_valid & cand_verified)[top_r], rank2,
                              jnp.float32(3e38))
            polished = polished.at[top_r].set(polished2)
            model_fit = model_fit.at[top_r].set(fit2)
            # only tier-2 survivors can win (tier-1 losers were outranked
            # on the same metric at coarser resolution)
            ranked = jnp.full_like(ranked, 3e38).at[top_r].set(rank2)
            # ... in EVERY selection mode: with select_by_model_fitness
            # off the winner comes from effective_fitness (view fitness),
            # which must not pick a candidate whose polish stopped at the
            # coarse tier-1 rows. EXCEPT for no-model banks: their tier-1
            # ranking ran on the all-masked placeholder model, so its
            # top_r is meaningless and must not restrict the view-fitness
            # selection.
            in_top = jnp.zeros((C,), bool).at[top_r].set(True)
            effective_fitness = jnp.where(in_top | ~has_model,
                                          effective_fitness,
                                          jnp.float32(3e38))
        if cfg.select_by_model_fitness:
            effective_fitness = jnp.where(has_model, ranked, effective_fitness)
    else:
        polished, model_fit = full_cands, cand_fitness
        coverage = unexplained = None

    best = jnp.argmin(effective_fitness)
    view_idx = cand_views[best]
    view_pose = cand_poses[best]
    fitness = cand_fitness[best]
    # CAD model → scene: the view cloud is T_org(model), so compose with the
    # bank's ground-truth view pose (reference ``Full_pose_new = icp·hough·T_org``,
    # SHOT_demo.cpp:656); banks saved before the full-CAD field existed
    # carry an empty model and keep the unpolished composition.
    if cfg.final_icp_iterations > 0:
        full_pose = jnp.where(has_model, polished[best], full_cands[best])
        full_fitness = jnp.where(has_model, model_fit[best], fitness)
        accepted = jnp.where(has_model,
                             full_fitness < cfg.final_accept_fitness,
                             fitness < cfg.accept_fitness)
    else:
        full_pose = full_cands[best]
        full_fitness = jnp.where(has_model & cfg.select_by_model_fitness,
                                 model_fit[best], fitness)
        accepted = (fitness < cfg.accept_fitness)
    if two_tier and cfg.final_icp_iterations > 0:
        # the winner's tier-1 view_pose was refined at stride-reduced rows;
        # re-derive the view→scene transform from the tier-2 polished
        # composed pose (full = view ∘ T_org ⇒ view = full ∘ T_org⁻¹) so
        # the aligned cloud, OBB and grasp centroid are tier-2-grade
        from tpu_joints.core.transforms import invert_rigid

        view_pose = jnp.where(
            has_model,
            compose(full_pose, invert_rigid(bank.poses[view_idx])),
            view_pose)
    accepted = accepted & cand_valid[best] & cand_verified[best]
    if cfg.coverage_accept > 0.0 and unexplained is None:
        # the gate depends on the coverage computation — fail loudly at
        # trace time instead of silently accepting the flips it exists to
        # reject (cfg attrs are static, so this is a config error, not data)
        raise ValueError(
            "coverage_accept > 0 requires rank_scene_coverage=True plus a "
            "ranking stage (select_by_model_fitness=True or "
            "final_icp_iterations > 0)")
    if unexplained is not None and cfg.coverage_accept > 0.0:
        # scene-coverage acceptance gate: even the best candidate must
        # EXPLAIN the scene — at most ``coverage_accept`` of the scene's
        # points may sit farther than 2 cm from the posed model. On views
        # where the symmetry-breaking feature is barely visible, a flipped
        # pose can pass the score2 gate (the CAD's occluded back dominates
        # that metric for any pose) — but it cannot explain the stranded
        # scene points. Opt-in (> 0): only sound when the scene is mostly
        # the object (e.g. after the segmentation crop); a cluttered
        # unsegmented scene legitimately has model-unexplainable points.
        # Banks without a stored CAD model carry no coverage signal — the
        # gate must not fire on their all-sentinel placeholder.
        accepted = accepted & (
            (unexplained[best] < cfg.coverage_accept) | ~has_model)

    from tpu_joints.core.transforms import transform_points

    aligned = Cloud(
        xyz=transform_points(bank.view_xyz[view_idx], view_pose),
        mask=bank.view_mask[view_idx],
        rgb=jnp.zeros((bank.view_xyz.shape[1], 3), jnp.float32),
    )
    if cfg.obb_largest_cluster:
        # reference OBB semantics: region-grow the aligned model, box the
        # dominant smooth cluster only (SHOT_demo.cpp:697-740)
        from tpu_joints.recognize.obb import oriented_bounding_box_clustered

        box = oriented_bounding_box_clustered(
            aligned, min_cluster_size=cfg.rg_min_cluster)
    else:
        box = oriented_bounding_box(aligned)

    metrics = {
        "scene_points": feats.cloud.count(),
        "scene_keypoints": feats.keys.count(),
        "valid_descriptors": jnp.sum(feats.desc_valid.astype(jnp.int32)),
        "correspondences": n_corr_total,
        "instances": jnp.sum(inst.valid.astype(jnp.int32)),
        # max, not [0]: under n_parts > 1 the flattened per-part top-k no
        # longer leads with the global best
        "best_votes": jnp.max(top_votes),
    }
    if coverage is not None:
        metrics["best_coverage"] = coverage[best]
        metrics["cand_coverage"] = coverage
        metrics["best_unexplained"] = unexplained[best]
        metrics["cand_unexplained"] = unexplained
    # per-candidate composed CAD→scene poses + full-model fitness, for the
    # multi-instance GOOD list (``good_instances``; SHOT_hypothesis.cpp's
    # per-instance verdict loop, :653-721). ``polished``/``model_fit`` fall
    # back to the unpolished composition / view fitness when no ranking
    # stage ran, so the fields are always present and C-shaped.
    metrics["cand_full_poses"] = jnp.where(has_model, polished, full_cands)
    metrics["cand_full_fitness"] = jnp.where(has_model, model_fit,
                                             cand_fitness)
    metrics["has_model"] = has_model
    # which candidates carry tier-2 (acceptance-grade) values: all of them
    # single-tier; only the refine_top survivors under two-tier (the rest
    # keep tier-1 stride-reduced poses/fitness/coverage — ranking-grade).
    # No-model banks mirror the winner selection above: their tier-1
    # ranking ran on the all-masked placeholder, so in_top is meaningless
    # and must not strike candidates from the GOOD list.
    metrics["cand_tier2"] = ((in_top | ~has_model) if two_tier
                             else jnp.ones((C,), bool))
    return DetectionResult(
        full_pose=full_pose,
        view_pose=view_pose,
        fitness=fitness,
        full_fitness=full_fitness,
        accepted=accepted,
        view_idx=view_idx,
        n_corrs=cand_ncorrs[best],
        cand_poses=cand_poses,
        cand_fitness=cand_fitness,
        cand_views=cand_views,
        cand_valid=cand_valid,
        cand_verified=cand_verified,
        obb=box,
        metrics=metrics,
    )


_detect_features_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "n_parts")
)(detect_with_features)


def _strip_crop(cfg: DetectionConfig) -> DetectionConfig:
    """The organized front end owns the crop chain; detect must not re-run
    it on the already-cropped working set."""
    import dataclasses

    if cfg.segment_scene or cfg.remove_plane:
        return dataclasses.replace(cfg, segment_scene=False,
                                   remove_plane=False)
    return cfg


def _tier_cfg(bank: ModelBank, cfg: DetectionConfig) -> DetectionConfig:
    """Disable two-tier refinement for banks without a full-CAD model.

    Two-tier strides the view-ICP rows and relies on the tier-2 full-CAD
    polish to set the final accuracy; a legacy bank's all-masked model
    placeholder makes that polish a no-op, so engaging the stride would
    silently ship coarser poses with nothing downstream to recover them
    (and its tier-1 ranking would be meaningless). Host-side: the bank is
    concrete at every public entry, while inside the traced pipeline the
    model mask is a tracer and the stride is a static Python decision.
    """
    import dataclasses

    import numpy as np

    if cfg.refine_top > 0 and not np.any(np.asarray(bank.model_mask)):
        return dataclasses.replace(cfg, refine_top=0)
    return cfg


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "half_window"))
def _organized_features_jit(
    xyz_img, valid, cfg, block, half_window, crop_lo, crop_hi, viewpoint):
    """Raw organized frame → SceneFeatures in ONE program: ingest (with the
    lattice crop chain when cfg asks for it) + prepare_scene fused. Neither
    stage contains a Mosaic kernel, so fusing them is safe under the
    one-kernel-program-per-executable policy — and it saves a dispatch
    round per frame (measurable under a remote TPU attachment, where each
    dispatch rides the tunnel's control channel)."""
    from tpu_joints.pipelines.ingest import (
        ingest_organized_blocks, ingest_organized_segmented)

    kg = cfg.key_group if cfg.keypoints == "lattice" else 0
    key_select = None
    if cfg.segment_scene or cfg.remove_plane:
        out = ingest_organized_segmented(
            xyz_img, valid, cfg, block=block, half_window=half_window,
            crop_lo=crop_lo, crop_hi=crop_hi, viewpoint=viewpoint,
            key_group=kg)
    else:
        out = ingest_organized_blocks(
            xyz_img, valid, block=block, half_window=half_window,
            capacity=cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi,
            viewpoint=viewpoint, key_group=kg)
    if kg > 0:
        scene, normals, curvature, n_sel, key_select = out
    else:
        scene, normals, curvature, n_sel = out
    feats = prepare_scene(scene, _strip_crop(cfg), viewpoint, normals,
                          curvature, key_select=key_select)
    return feats, n_sel


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "half_window"))
def _organized_detect_fused_jit(
    xyz_img, valid, bank, cfg, block, half_window, crop_lo, crop_hi,
    viewpoint):
    """Single-dispatch variant: the whole frame→pose chain in ONE
    executable. Contains exactly one Mosaic kernel program (the ICP k=1
    NN), so it stays inside the empirically safe one-kernel-per-executable
    envelope. Under a remote TPU attachment each dispatch costs a
    control-channel round (~10 ms measured), which makes dispatch count —
    not device compute — the serving bottleneck; locally the two-dispatch
    split compiles faster and measures the same."""
    feats, n_sel = _organized_features_jit.__wrapped__(
        xyz_img, valid, cfg, block, half_window, crop_lo, crop_hi, viewpoint)
    return detect_with_features(feats, bank, _strip_crop(cfg)), n_sel


def detect_organized(
    xyz_img,
    valid,
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
    block: int = 4,
    half_window: int = 5,
    crop_lo=None,
    crop_hi=None,
    viewpoint: Optional[jnp.ndarray] = None,
    fused: bool = False,
):
    """Complete raw-sensor entry: 640×480 organized frame → 6D pose in two
    dispatches (fused ingest+features, then match+refine) — or one, with
    ``fused=True``. This is the reference's live path
    (``ROS_server.cpp:2112-2176`` → ``SHOT.cpp:204``) as one API call;
    when ``cfg.segment_scene``/``cfg.remove_plane`` are set, the crop
    chain runs on the sensor lattice inside the first program
    (``pipelines.ingest.ingest_organized_segmented``).

    Returns (DetectionResult, n_selected).
    """
    cfg = _tier_cfg(bank, cfg)   # no-model banks: two-tier off (see helper)
    if fused:
        return _organized_detect_fused_jit(
            xyz_img, valid, bank, cfg, block, half_window, crop_lo, crop_hi,
            viewpoint)
    feats, n_sel = _organized_features_jit(
        xyz_img, valid, cfg, block, half_window, crop_lo, crop_hi, viewpoint)
    return _detect_features_jit(feats, bank, _strip_crop(cfg)), n_sel


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "half_window"))
def _organized_detect_batch_jit(
    xyz_imgs, valids, bank, cfg, block, half_window, crop_lo, crop_hi,
    viewpoint):
    def one(img, vmask):
        return _organized_detect_fused_jit.__wrapped__(
            img, vmask, bank, cfg, block, half_window, crop_lo, crop_hi,
            viewpoint)

    return jax.vmap(one)(xyz_imgs, valids)


def detect_organized_batch(
    xyz_imgs,
    valids,
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
    block: int = 4,
    half_window: int = 5,
    crop_lo=None,
    crop_hi=None,
    viewpoint: Optional[jnp.ndarray] = None,
):
    """Batched raw-sensor entry: ``[B, H, W, 3]`` frames → B poses in ONE
    dispatch — the steady-state serving formulation.

    The reference's server processes one frame per callback
    (``SHOT.cpp:592-602``); on TPU, dispatch latency — not device compute —
    bounds a one-frame-at-a-time stream (measured: 16.9 ms compute vs
    ~30 ms dispatch+sync under a remote attachment,
    ``docs/PERFORMANCE.md``), so a server should drain its queue into a
    batch and amortize the roundtrip. The batch is a plain ``vmap`` of the
    fused chain: the batched Pallas ICP NN stays ONE Mosaic program (the
    batch axis becomes an outer grid dimension), and under a
    ``jax.sharding.Mesh`` the batch axis shards over ``data`` (see
    ``distributed.batch``).

    Returns ``(DetectionResult, n_selected[B])`` with a leading batch axis
    on every leaf.
    """
    cfg = _tier_cfg(bank, cfg)
    return _organized_detect_batch_jit(
        xyz_imgs, valids, bank, cfg, block, half_window, crop_lo, crop_hi,
        viewpoint)
