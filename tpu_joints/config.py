"""Pipeline configuration (SURVEY.md A32).

One frozen dataclass replaces the reference's copy-pasted
``parseCommandLine`` (``SHOT.cpp:81-143``) and its per-file global defaults
(``model_ss_`` 0.02 at ``SHOT.cpp:49``, 0.005 at ``SHOT_segment.cpp:50``,
0.01 at ``SHOT_VAR.cpp:54``…). Field names keep the reference's flag names
(``model_ss``, ``scene_ss``, ``rf_rad``, ``descr_rad``, ``cg_size``,
``cg_thresh``, ``--algorithm Hough|GC``). Presets are named after the
reference programs they reproduce.

Frozen + hashable so a config can be a `jit` static argument: one compiled
executable per preset, reused across scenes (pad-to-bucket keeps shapes
stable).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    # descriptor
    descriptor: str = "shot"          # "shot" | "fpfh"
    descr_rad: float = 0.02           # SHOT.cpp:52 (descr_rad_ 0.02)
    rf_rad: float = 0.015             # SHOT.cpp:51
    # Hough voting frames: "shot" (SHOT LRF) or "board" (the reference feeds
    # BOARD frames to Hough in every driver, SHOT.cpp:441-453). Must match
    # the frames the bank was built with.
    rf_frames: str = "shot"
    # support gather width for the frame estimators: BOARD needs the margin
    # annulus of the rf_rad ball populated, so this must exceed the expected
    # point count inside the full radius (k nearest ≠ radius coverage)
    rf_k_max: int = 256
    # sampling
    model_ss: float = 0.01            # CAD_desc.cpp uniform sampling 0.01
    scene_ss: float = 0.03            # SHOT_demo VoxelGrid 0.03 (:413-417)
    # keypoint detector: "uniform" (UniformSampling, the reference default),
    # "iss" (the commented-out ISSKeypoint3D alternative, SHOT.cpp:329-352),
    # or "lattice" (organized front end only: keys selected per
    # key_group×key_group tile cell ON the sensor lattice inside ingest —
    # pure stencil ops, no sort; a 2-D-lattice stand-in for the 3-D voxel
    # semantics that is equivalent on bounded-depth single-view surfaces)
    keypoints: str = "uniform"
    # tile-cell edge (in ingest tiles) of the "lattice" keypoint detector:
    # one key per key_group² tiles ≈ scene_ss / (block · pixel pitch)
    key_group: int = 3
    iss_gamma_21: float = 0.975       # SHOT.cpp:338-339
    iss_gamma_32: float = 0.975
    # normals
    normal_k: int = 40                # SHOT.cpp:302-308 (k=40)
    # > 0: radius-support normals instead of kNN (FPFH_demo.cpp:405-428
    # pairs FPFH with setRadiusSearch(0.15) normals); uses k_max lanes
    normal_radius: float = 0.0
    # 0 = exact all-points kNN normals; >0 = anchor-subsampled normals with
    # nearest-anchor propagation (big-cloud fast path; see
    # features.normals.estimate_normals_anchored)
    normal_anchors: int = 0
    # FPFH search surface: "cloud" computes each keypoint's FPFH over the
    # full working-set cloud; "keys" over the keypoint cloud itself — the
    # reference's exact FPFH parameterization (``FPFH_demo.cpp:423-428``
    # sets the VoxelGrid keypoints as input with NO setSearchSurface, so
    # PCL searches the keypoint cloud). "keys" is what makes the r=0.15
    # support tractable: at keypoint spacing the 0.15-ball holds ~200
    # points instead of the working set's ~1500.
    fpfh_surface: str = "cloud"
    # support-gather width for FPFH when it differs from k_max (the 0.15
    # radius needs ~2× the lanes of the SHOT 0.06 support); 0 = use k_max
    fpfh_k_max: int = 0
    # matching
    match_mode: str = "nn"            # "nn" (abs gate) | "ratio"
    match_threshold: float = 0.25     # squared desc distance, SHOT.cpp:418
    ratio: float = 1.0                # SHOT_demo.cpp:522-524
    # grouping
    algorithm: str = "hough"          # "hough" | "gc" (SHOT.cpp --algorithm)
    cg_size: float = 0.03             # SHOT.cpp:53 (Hough bin / GC size)
    cg_thresh: float = 3.0            # SHOT.cpp:54
    use_distance_weight: bool = True  # SHOT.cpp:460
    max_instances_per_view: int = 4
    # candidate cut groups by VIEW: pick the top (max_candidates /
    # max_instances_per_view) views by their strongest bin's votes, then
    # admit ALL bins of each selected view. A pure vote-ranked cut is
    # flip-blind — on near-symmetric parts the 180°-flipped bin of the
    # correct view can out-vote the true bin under sensor noise, and with
    # spam views contributing their own high-vote bins the true pose falls
    # out of the cut entirely (measured: 2/4 bench noise draws). The
    # correct VIEW always ranks high (the flip's votes are its votes), so
    # grouping guarantees the true bin enters the field for the
    # coverage-dominant ranking to arbitrate. Needs max_instances_per_view
    # > 1 to matter; off keeps the strict vote-ranked cut.
    view_grouped_candidates: bool = False
    # candidate cut groups by PEAK instead: under split_rotation_modes the
    # instance table interleaves [peak0·mode0, peak0·mode1, peak1·mode0, …]
    # per view, so adjacent row PAIRS are the two rotation modes of ONE
    # translation peak. This cut ranks all (view, peak) pairs globally by
    # the pair's strongest mode and admits BOTH modes of each kept pair —
    # the same flip guarantee as view grouping (true and flipped matches
    # share the translation bin, so the pair ranks by their joint vote
    # mass) but instance-aware: in a multi-object scene each physical
    # instance's peaks compete on their own votes rather than through
    # whichever view happens to see both (the view-grouped cut kept only
    # max_candidates/P views and a vote-rich instance starved the other
    # out of the field — measured on the two-instance bench scene). With
    # max_instances_per_view == 2 (one peak × two modes per view) this is
    # identical to view grouping. Takes precedence over
    # view_grouped_candidates; needs split_rotation_modes row layout.
    peak_grouped_candidates: bool = False
    # Hough instances split each translation peak into its two ROTATION
    # modes (true vs 180°-flipped matches share the bin — a flip preserves
    # the voted centroid — and the per-bin Umeyama otherwise follows
    # whichever mode dominates the noise draw). Needs even
    # max_instances_per_view; pairs naturally with
    # view_grouped_candidates. See recognize.hough.hough_group.
    split_rotation_modes: bool = False
    # refinement
    icp_iterations: int = 30          # SHOT.cpp icp_align: 100 iters; 30 suffices with exact NN
    icp_max_corr_dist: float = 3.0e38 # SHOT_hypothesis.cpp:511 uses 0.001
    # > 0 enables a coarse-to-fine correspondence-gate schedule from this
    # value down to icp_max_corr_dist (wide basin early, occlusion-robust
    # trimming late — see recognize.icp._corr_thresholds)
    icp_max_corr_start: float = 0.0
    # point-to-plane candidate refinement (PCL parity is point-to-point;
    # plane converges in ~half the iterations on cylinder-dominated scenes)
    icp_point_to_plane: bool = False
    max_candidates: int = 4           # instances refined by ICP
    # > 0 bounds the folded NN rows of each batched-ICP call: wider
    # candidate fields run as sequential equal-shape icp_multi calls so
    # every Pallas NN kernel in the process keeps ONE program shape (the
    # TPU runtime's multi-Mosaic-program re-execution fault,
    # docs/PERFORMANCE.md). E.g. 8192 lets a 32×512-row tier-1 run as
    # two proven 8192-row scans. 0 = one call regardless of width.
    icp_rows_per_call: int = 0
    # False routes every batched-ICP NN round to the XLA top-k path
    # instead of the Pallas fused kernel. Use for configs whose NN target
    # lane count differs from the serving chain's (e.g. the wide-capacity
    # multi-instance verdict config): a second Mosaic program SHAPE in
    # the process re-triggers the runtime's re-execution fault even when
    # the row count matches (docs/PERFORMANCE.md "TPU runtime fault").
    # Costs ~2x the NN round on latency chains; irrelevant for
    # correctness-gated verdict configs.
    icp_allow_pallas: bool = True
    accept_fitness: float = 0.001     # SHOT.cpp:187
    # rank candidates by the FULL CAD's fitness at the composed pose (the
    # reference's best-score2 tracking, SHOT_demo.cpp:669-681) instead of
    # the matched view cloud's own fitness, which is blind to the chord
    # cylinder's slide/spin symmetry. Ignored for banks without a model.
    select_by_model_fitness: bool = True
    # add a scene→model coverage term to the candidate ranking: mean
    # clipped NN distance² of every scene point to the posed full CAD.
    # The reference ranks by model→scene fitness only, which is flip-blind
    # on near-symmetric parts (the CAD's occluded back dominates the score
    # for true and flipped poses alike); scene points are all visible by
    # construction, so a flip that strands part of the scene unexplained
    # pays full price (see recognize.icp.scene_coverage_multi). The
    # acceptance GATE stays on the reference's score2 quantity. False
    # restores strict reference ranking semantics.
    rank_scene_coverage: bool = True
    # per-point contribution cap (meters) for the coverage term: bounds the
    # influence of residual clutter the model legitimately cannot explain
    coverage_clip: float = 0.05
    # > 0: also GATE acceptance on the winner's UNEXPLAINED fraction — at
    # most this fraction of valid scene points may sit farther than 2 cm
    # from the posed model. Rejects flips that pass the score2 gate on
    # views where the symmetry-breaking feature is barely visible (a flip
    # strands those points; a true pose strands none, independent of the
    # model's subsample density). Only sound for (mostly) object-only
    # scenes, e.g. after the segmentation crop; leave 0 for cluttered
    # unsegmented scenes.
    coverage_accept: float = 0.0
    # compute the coverage-gate 'unexplained' fraction LOCALLY — over the
    # scene points inside each candidate's own model footprint — instead
    # of over the whole scene. Required for the coverage_accept gate in
    # multi-instance scenes (the other instance's points otherwise
    # dominate the global fraction); identical to global on single-object
    # scenes. See recognize.icp.scene_coverage_multi(local=True).
    coverage_local: bool = False
    # two-tier candidate refinement: > 0 refines ALL candidates at a
    # stride-reduced row budget (``tier1_rows`` per candidate), ranks them
    # by coverage + model fitness, then spends the full row budget
    # (icp rows + final polish + dense coverage) on only the top
    # ``refine_top`` survivors. The NN distance work of the refinement
    # stage — the latency-dominant compute of the whole pipeline — drops
    # ~(C/refine_top)× while the final accuracy is set entirely by the
    # tier-2 pass. 0 = single-tier (every candidate gets the full budget),
    # the strict compute-all reference shape. Applies to the single-part
    # detect pipeline; ``pipelines.multi.detect_parts`` always runs
    # single-tier (its per-part candidate fields are already small).
    refine_top: int = 0
    # per-candidate ICP/polish row budget of the tier-1 pass (stride
    # subsample of the bank's icp clouds); only read when refine_top > 0
    tier1_rows: int = 512
    # ICP iteration budget of the tier-1 (ranking-only) stages — the view
    # refinement and the ranking polish. The refinement stage's latency is
    # per-iteration overhead-bound (each iteration is one sequential NN
    # round), so ranking at 3-4 iterations while tier 2 runs the full
    # budget cuts the stage's sequential depth nearly in half. 0 = tier 1
    # uses the full budgets (icp_iterations / final_icp_iterations); only
    # read when refine_top > 0.
    tier1_iterations: int = 0
    # finer-grained tier-1 budgets (latency levers — each ICP iteration is
    # one sequential ~0.5 ms NN round, the refinement stage's latency
    # driver): view ICP and full-CAD ranking polish budgets separately.
    # 0 = inherit (tier1_iterations for the view stage;
    # min(tier1_iterations, final_icp_iterations) for the polish stage).
    tier1_view_iterations: int = 0
    tier1_polish_iterations: int = 0
    # skip the tier-1 view ICP's trailing fitness pass (one NN round):
    # under two-tier + select_by_model_fitness the per-view fitness is
    # reporting-only (ranking uses coverage + full-CAD fit; acceptance
    # gates on the tier-2 full-CAD fitness), so the round is droppable.
    # The winner's cand_fitness then reads 0.0 — don't enable in presets
    # that gate or report on view fitness.
    tier1_skip_view_fitness: bool = False
    # final composed-pose ICP on the FULL CAD model (SHOT_demo.cpp:641-686):
    # 0 disables; reference chains 1-iteration ICPs and gates score2 < 0.006
    final_icp_iterations: int = 0
    final_accept_fitness: float = 0.006
    # point-to-plane final polish (scene normals are already in hand): far
    # faster convergence than point-to-point on near-symmetric cylinder
    # geometry — the reference compensates with 100-iteration point-to-point
    # runs (SHOT.cpp:180). False keeps strict PCL point-to-point semantics.
    final_point_to_plane: bool = True
    # verification (SHOT_hypothesis.cpp:56-64)
    hv_enabled: bool = False
    hv_inlier_threshold: float = 0.005
    hv_occlusion_threshold: float = 0.001
    hv_regularizer: float = 0.001
    # dominant-plane removal before clustering (segmentation.cpp:94-110:
    # RANSAC plane from normals, then ExtractIndices drops the inliers —
    # the reference's answer to the workshop table under the joint)
    remove_plane: bool = False
    plane_dist: float = 0.02          # segmentation.cpp:88 (0.03 at range)
    # only drop a plane that actually dominates the scene; a best-fit
    # tangent patch on the chord must never be removed
    plane_min_fraction: float = 0.15
    # segmentation preprocessing (SHOT_demo.cpp:282-400)
    segment_scene: bool = False
    rg_smoothness_deg: float = 7.0
    rg_curvature: float = 7.0
    rg_min_cluster: int = 50
    # region-growing backend for UNORGANIZED input: "graph" reproduces
    # PCL's BFS over an explicit kNN graph (O(N²) graph build — the cost
    # the organized lattice path avoids); "voxel" rasterizes the cloud
    # onto a coarse 3-D lattice and grows there (segment.voxel) — O(N)
    # scatter + O(G³·log diameter) stencils, the bounded-cost path for
    # file-driven scenes (SHOT_scenes.cpp:204-254 batch shape). The
    # organized front end always uses the sensor lattice and ignores this.
    rg_backend: str = "graph"
    rg_voxel_leaf: float = 0.0        # voxel edge (m); 0 → 2 × scene_ss
    rg_voxel_grid: int = 64           # voxels per axis (static shape)
    # point spacing rg_smoothness_deg is calibrated for: the voxel gate
    # scales the angle by (voxel step / pitch) — PCL's smoothness is an
    # angle per point step, and a coarse lattice step turns a curved
    # surface proportionally farther (segment.voxel module doc)
    rg_voxel_pitch: float = 0.005
    # max region-growing edge length (meters): caps the kNN graph so
    # disjoint structures can't bridge (see segment.region_growing); the
    # default (unbounded) matches PCL semantics at sensor density
    rg_max_edge: float = 3.0e38
    cluster_max_curvature: float = 0.04
    # OBB semantics: region-grow the ALIGNED winning view (k=30 normals,
    # smoothness 5°, curvature 5.0) and fit the box to the largest smooth
    # cluster only — the reference's pre-step (SHOT_demo.cpp:697-740),
    # which keeps occluded/mis-trimmed alignments from skewing the box.
    # Off by default: it adds a normals+region-growing pass per detection.
    obb_largest_cluster: bool = False
    # capacities (static shapes; pad-to-bucket)
    scene_capacity: int = 16384
    scene_key_capacity: int = 1024
    k_max: int = 96


# ---------------------------------------------------------------------------
# Presets mirroring the reference programs (SURVEY.md §2.1)
# ---------------------------------------------------------------------------

SHOT_STREAM = DetectionConfig(
    # SHOT.cpp: model_ss 0.02, scene_ss 0.02, SHOT r=0.02, 1-NN < 0.20,
    # Hough bin 0.03 / thresh 3.0, ICP accept ≤ 0.001
    descriptor="shot", model_ss=0.02, scene_ss=0.02, descr_rad=0.02,
    match_mode="nn", match_threshold=0.20, algorithm="hough",
    cg_size=0.03, cg_thresh=3.0, accept_fitness=0.001,
)

SHOT_SEGMENT = DetectionConfig(
    # SHOT_segment.cpp: model_ss 0.005, scene_ss 0.01, 1-NN < 0.25, k=20 normals
    descriptor="shot", model_ss=0.005, scene_ss=0.01, descr_rad=0.02,
    normal_k=20, match_mode="nn", match_threshold=0.25,
)

SHOT_DEMO = DetectionConfig(
    # SHOT_demo.cpp: region-growing scene crop, VoxelGrid 0.03 keypoints,
    # ratio-test τ ≤ 1, chained full-CAD ICP accept < 0.006
    descriptor="shot", scene_ss=0.03, model_ss=0.02,
    match_mode="ratio", ratio=1.0, segment_scene=True,
    accept_fitness=0.006, final_icp_iterations=3,
    obb_largest_cluster=True,         # SHOT_demo.cpp:697-740 OBB pre-step
)

FPFH_DEMO = DetectionConfig(
    # FPFH_demo.cpp: FPFH r=0.15 over the keypoint cloud itself
    # (setInputCloud(keypoints), no setSearchSurface — :423-428),
    # VoxelGrid 0.03/0.02, ratio τ ≤ 1, region-growing crop, chained
    # full-CAD ICP accept < 0.006
    descriptor="fpfh", descr_rad=0.15, scene_ss=0.03, model_ss=0.02,
    fpfh_surface="keys", fpfh_k_max=192,
    normal_radius=0.15,               # FPFH_demo.cpp:405-428 radius normals
    rf_frames="board",                # FPFH_demo pairs FPFH with BOARD (:548-585)
    match_mode="ratio", ratio=1.0, segment_scene=True,
    accept_fitness=0.006, final_icp_iterations=3,
    obb_largest_cluster=True,         # FPFH_demo.cpp:693-842 OBB pre-step
)

SHOT_HYPOTHESIS = DetectionConfig(
    # SHOT_hypothesis.cpp: 1-NN < 0.25, ICP max-corr-dist 0.001, GO-HV on
    descriptor="shot", match_mode="nn", match_threshold=0.25,
    icp_max_corr_dist=0.001, hv_enabled=True,
)

SIX_D_POSE = DetectionConfig(
    # 6Dpose.cpp: normals k=10, 1-NN < 0.20, Hough, 100-iter + chained ICP
    descriptor="shot", normal_k=10, match_mode="nn", match_threshold=0.20,
)

PRESETS = {
    "shot": SHOT_STREAM,
    "shot_segment": SHOT_SEGMENT,
    "shot_demo": SHOT_DEMO,
    "fpfh_demo": FPFH_DEMO,
    "shot_hypothesis": SHOT_HYPOTHESIS,
    "6dpose": SIX_D_POSE,
}
