"""Hough-3D correspondence grouping (SURVEY.md A20).

TPU-native re-design of PCL's ``Hough3DGrouping::recognize`` (reference
``SHOT.cpp:456-469``, bin size 0.02-0.03, threshold 2-3, no interpolation,
distance-weighted): every model keypoint stores the offset to the model
centroid expressed in its local reference frame; a correspondence then casts
a vote for the model centroid's position in the scene. Votes scatter-add
into a dense 3-D accumulator; peaks above threshold (after 3³ non-max
suppression) become instances; each instance's pose is an SVD/Umeyama fit
over the correspondences that voted into its bin — exactly the reference's
semantics with ``setHoughBinSize/setHoughThreshold/setUseInterpolation(false)/
setUseDistanceWeight(true)``.

The accumulator has static extent GRID³ around the vote cloud's median, so
shapes stay jit-stable; votes outside are clamped to the border (they came
from wrong matches and never beat real peaks).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_joints.core.transforms import umeyama
from tpu_joints.recognize.matching import Correspondences

GRID = 64  # accumulator cells per axis (64³ = 262k bins ≈ 1 MB)


class Instances(NamedTuple):
    """Up to P candidate object instances from correspondence grouping.

    poses: float32[P, 4, 4] model→scene transforms; votes: float32[P]
    accumulated vote mass; n_corrs: int32[P] supporting correspondences;
    valid: bool[P]; membership: bool[P, M] which scene-keypoint
    correspondences support each instance (the reference's
    ``clustered_corrs``).
    """

    poses: jnp.ndarray
    votes: jnp.ndarray
    n_corrs: jnp.ndarray
    valid: jnp.ndarray
    membership: jnp.ndarray


def model_local_votes(
    model_keys: jnp.ndarray,
    model_rf: jnp.ndarray,
    model_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Training phase: per model keypoint, centroid offset in its LRF.

    PCL's ``Hough3DGrouping::train()`` equivalent.
    """
    w = model_mask.astype(jnp.float32)
    centroid = jnp.sum(model_keys * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    off = centroid[None, :] - model_keys  # [Nm, 3]
    return jnp.einsum("mij,mj->mi", model_rf, off)  # local coords (rf rows = axes)


# rotation-mode split: members farther than 90° (geodesic) from the
# mode's anchor are the opposite mode
_MODE_COS = 0.0
# consensus mode extraction: K top-weighted members tried as rotation
# anchors; the winning anchor's ~45° cone defines the mode. A single
# argmax anchor with a 90° cone blends rotation-phase-aliased matches —
# on a cylinder, wrong-phase matches still vote into the correct centroid
# bin (the centroid sits ON the axis), so the bin's members span a
# continuous phase smear and the Umeyama over them returns a 50–180°-off
# rotation (measured: the full-scale two-instance scene had 3–8 mm
# translation inits everywhere and NO rotation within ICP's basin).
_N_ANCHORS = 8
_CONE_COS = 0.7  # ≈ 45.6° geodesic


@functools.partial(
    jax.jit,
    static_argnames=("bin_size", "threshold", "max_instances",
                     "use_distance_weight", "split_rotation_modes"),
)
def hough_group(
    scene_keys: jnp.ndarray,
    scene_rf: jnp.ndarray,
    scene_rf_ok: jnp.ndarray,
    model_keys: jnp.ndarray,
    model_rf: jnp.ndarray,
    model_rf_ok: jnp.ndarray,
    model_mask: jnp.ndarray,
    corrs: Correspondences,
    bin_size: float = 0.03,
    threshold: float = 3.0,
    max_instances: int = 8,
    use_distance_weight: bool = True,
    split_rotation_modes: bool = False,
) -> Instances:
    """Group correspondences into rigid-instance hypotheses.

    Args mirror PCL: scene/model keypoints with their LRFs, plus the
    descriptor correspondences (scene → model).

    ``split_rotation_modes`` (needs even ``max_instances``): Hough votes
    live in TRANSLATION space — the predicted model-centroid location —
    so on a near-symmetric part the true matches and the 180°-flipped
    matches cast into the SAME bin (a flip preserves the centroid), and
    the per-bin Umeyama follows whichever mode dominates that noise draw
    (measured: 2/4 bench draws converge flipped with the true pose absent
    from the whole candidate field). Each correspondence also implies a
    full ROTATION hypothesis (scene LRF vs matched model LRF); true and
    flipped matches form two tight rotation clusters ~180° apart. With
    the split on, the top ``max_instances/2`` bins each emit TWO
    instances — the best consensus rotation cluster (K anchor candidates,
    ~45° cone — see ``_N_ANCHORS``/``_CONE_COS``) and the best cluster of
    the opposite hemisphere — so both modes reach the downstream coverage
    ranking, which is exactly the discriminator built to arbitrate flips.
    Members in neither cone (rotation-phase-aliased cylinder matches) are
    excluded from the per-mode Umeyama, which is what keeps the fitted
    rotations inside ICP's convergence basin.
    """
    M = scene_keys.shape[0]
    mi = corrs.model_idx
    cvalid = corrs.valid & scene_rf_ok & model_rf_ok[mi] & model_mask[mi]

    local = model_local_votes(model_keys, model_rf, model_mask)  # [Nm, 3]
    cast = local[mi]  # [M, 3]
    # scene position of the predicted model centroid: p + R_scene^T · local
    votes_xyz = scene_keys + jnp.einsum("mji,mj->mi", scene_rf, cast)

    # Distance weighting (PCL's setUseDistanceWeight(true), SHOT.cpp:460):
    # closer descriptor matches vote stronger. PCL's raw ``1 - distance``
    # only makes sense at SHOT's O(1) distance scale — FPFH squared
    # distances run into the hundreds and would flatten every weight, so
    # the weight here is the scale-free 1/(1+d²) *normalized to mean 1
    # over the valid correspondences*: the accumulator then counts
    # "average-quality votes" and ``threshold`` keeps the reference's
    # vote-count semantics for every descriptor.
    nvalid = jnp.maximum(jnp.sum(cvalid.astype(jnp.float32)), 1.0)
    if use_distance_weight:
        w = 1.0 / (1.0 + corrs.dist_sq) * cvalid.astype(jnp.float32)
        w = w * (nvalid / jnp.maximum(jnp.sum(w), 1e-9))
    else:
        w = cvalid.astype(jnp.float32)

    # static-extent accumulator centered on the weighted vote median (the
    # mean is robust enough here and cheaper than a true median)
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    center = jnp.sum(votes_xyz * w[:, None], axis=0) / wsum
    lo = center - (GRID / 2.0) * bin_size
    ijk = jnp.floor((votes_xyz - lo) / bin_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, GRID - 1)
    flat = (ijk[:, 0] * GRID + ijk[:, 1]) * GRID + ijk[:, 2]

    acc = jnp.zeros((GRID * GRID * GRID,), jnp.float32).at[flat].add(w)
    acc3 = acc.reshape(GRID, GRID, GRID)

    # non-max suppression over the 3³ neighborhood. Max is associative, so
    # the 27-tap window separates into three 1-D 3-tap passes — identical
    # values, ~9× less HBM traffic than the naive lowering (per view the
    # accumulator is 1 MB; vmapped over 42–84 views this is the grouping
    # stage's dominant memory stream).
    pooled = acc3
    for axis in range(3):
        win = [1, 1, 1]
        win[axis] = 3
        pooled = jax.lax.reduce_window(
            pooled, -jnp.inf, jax.lax.max, tuple(win), (1, 1, 1), "SAME"
        )
    is_peak = (acc3 >= pooled) & (acc3 >= threshold)
    peak_score = jnp.where(is_peak, acc3, -1.0).reshape(-1)
    split = split_rotation_modes and max_instances % 2 == 0
    n_peaks = max_instances // 2 if split else max_instances
    top_votes, top_bins = jax.lax.top_k(peak_score, n_peaks)

    membership = (flat[None, :] == top_bins[:, None]) & cvalid[None, :]  # [Pk, M]

    if split:
        # per-correspondence rotation hypothesis: rf rows are axes, so
        # scene_rf = model_rf · Rᵀ  ⇒  R = scene_rfᵀ · model_rf
        R_corr = jnp.einsum("mts,mtk->msk", scene_rf, model_rf[mi])

        def consensus(mem):
            """Best rotation-coherent subset of ``mem``: K top-weighted
            members tried as anchors, each claiming the members within a
            ~45° geodesic cone of its own rotation hypothesis; the anchor
            with the most weighted agreement wins. Returns (cone members,
            cos-to-winning-anchor)."""
            ww = mem.astype(jnp.float32) * w
            _, anchors = jax.lax.top_k(ww, _N_ANCHORS)          # [K]
            cosang = (jnp.einsum("kij,mij->km", R_corr[anchors], R_corr)
                      - 1.0) / 2.0                               # [K, M]
            agree = (cosang > _CONE_COS) & mem[None, :]
            score = jnp.sum(agree.astype(jnp.float32) * w[None, :], axis=1)
            # a padded anchor (ww==0 ⇒ an invalid member) must not win
            score = jnp.where(ww[anchors] > 0.0, score, -1.0)
            best = jnp.argmax(score)
            return agree[best], cosang[best]

        def modes(mem):
            m1, cos1 = consensus(mem)
            # mode 2: the rotation-coherent core of the OPPOSITE side
            # (> 90° from mode 1's anchor) — for a near-symmetric part
            # that is the 180°-flipped match cluster
            m2, _ = consensus(mem & (cos1 <= _MODE_COS))
            return m1, m2

        m1, m2 = jax.vmap(modes)(membership)
        # interleave [peak0·mode0, peak0·mode1, peak1·mode0, ...] so the
        # per-view instance table stays vote-descending-ish per peak
        membership = jnp.stack([m1, m2], axis=1).reshape(
            2 * n_peaks, membership.shape[1])
        # per-mode vote mass (the bin total belongs to both modes jointly)
        top_votes = jnp.sum(membership.astype(jnp.float32) * w[None, :],
                            axis=1)
    inst_valid = top_votes >= threshold
    n_corrs = jnp.sum(membership.astype(jnp.int32), axis=1)

    def fit(mem):
        ww = mem.astype(jnp.float32) * w
        return umeyama(model_keys[mi], scene_keys, ww)

    poses = jax.vmap(fit)(membership)
    inst_valid = inst_valid & (n_corrs >= 3)
    return Instances(
        poses=poses,
        votes=jnp.maximum(top_votes, 0.0),
        n_corrs=n_corrs,
        valid=inst_valid,
        membership=membership,
    )
