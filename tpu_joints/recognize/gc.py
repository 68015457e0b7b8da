"""Geometric-consistency correspondence grouping (SURVEY.md A21).

TPU-native counterpart of PCL's ``GeometricConsistencyGrouping::recognize``
(reference ``SHOT.cpp:471-483``, the ``--algorithm GC`` alternative): two
correspondences are consistent when the model-side and scene-side keypoint
distances agree within ``gc_size``; clusters of mutually consistent
correspondences of size ≥ ``gc_threshold`` become instances.

PCL grows clusters sequentially in *match-quality order* (correspondences
sorted by descriptor distance; each candidate checked against the members
added so far — a strict order-dependent clique walk). Here the greedy is
batched but keeps both spam defenses PCL gets from that walk:

* **Seeding by match quality, not support.** At full sensor scale the
  ±``gc_size`` distance-agreement relation is loose (3 cm on a ~1 m crop):
  random spurious correspondences agree pairwise ~10–20% of the time, so
  the largest *consistent set* belongs to a diffuse spam blob, not the
  rigid instance (measured on the 640×480 bench frame — support-seeded GC
  never extracted the true cluster). The seed is instead the unused
  correspondence with the smallest descriptor distance among those with
  enough support — the batched analog of PCL's sorted iteration, and true
  matches have the best descriptor distances.
* **Agreement pruning relative to the strongest member, not the cluster
  size.** The seeded set is majority-spam at scale (true cluster ~tens,
  plus ~15% of everything else), so "agree with ≥ 90% of the cluster"
  prunes the TRUE members along with the spam. True members mutually
  agree (~n_true each) while spam agrees with ~15% of the membership, so
  keeping members above half the *maximum* agreement separates the rigid
  clique from the blob regardless of how much spam the seed attracted;
  iterating tightens the threshold as the blob drains.

On rigid data the consistency relation is transitive up to noise, so this
converges to the same clusters as PCL's sequential walk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_joints.core.transforms import umeyama
from tpu_joints.recognize.hough import Instances
from tpu_joints.recognize.matching import Correspondences

_REFINE_ROUNDS = 3
_KEEP_FRACTION = 0.5  # of the strongest member's agreement count


@functools.partial(
    jax.jit, static_argnames=("gc_size", "gc_threshold", "max_instances")
)
def gc_group(
    scene_keys: jnp.ndarray,
    model_keys: jnp.ndarray,
    model_mask: jnp.ndarray,
    corrs: Correspondences,
    gc_size: float = 0.01,
    gc_threshold: float = 5.0,
    max_instances: int = 8,
) -> Instances:
    M = scene_keys.shape[0]
    mi = corrs.model_idx
    cvalid = corrs.valid & model_mask[mi]
    corr_dist = jnp.where(cvalid, corrs.dist_sq, jnp.inf)

    sp = scene_keys  # [M, 3] scene keypoint of each correspondence
    mp = model_keys[mi]  # [M, 3] matched model keypoint
    ds = jnp.linalg.norm(sp[:, None, :] - sp[None, :, :], axis=-1)
    dm = jnp.linalg.norm(mp[:, None, :] - mp[None, :, :], axis=-1)
    consistent = (jnp.abs(ds - dm) < gc_size) & cvalid[:, None] & cvalid[None, :]
    # a correspondence is always consistent with itself
    consistent = consistent | (
        jnp.eye(M, dtype=bool) & cvalid[:, None]
    )

    def body(carry, _):
        used = carry
        avail = cvalid & jnp.logical_not(used)
        support = jnp.sum((consistent & avail[None, :]).astype(jnp.int32), axis=1)
        # seed = best descriptor match among still-available correspondences
        # whose consistent set could clear the threshold (PCL's sorted walk)
        qualified = avail & (support >= gc_threshold)
        seed_score = jnp.where(qualified, -corr_dist, -jnp.inf)
        seed = jnp.argmax(seed_score)
        members = consistent[seed] & avail
        for _ in range(_REFINE_ROUNDS):
            agree = jnp.sum((consistent & members[None, :]).astype(jnp.float32), axis=1)
            agree = jnp.where(members, agree, 0.0)
            peak = jnp.maximum(jnp.max(agree), 1.0)
            members = members & (agree >= _KEEP_FRACTION * peak)
        n = jnp.sum(members.astype(jnp.int32))
        ok = (n >= gc_threshold) & qualified[seed]
        # consume the attempt even when the cluster collapses below the
        # threshold (ok=False): otherwise `used` never grows and every
        # remaining scan slot re-picks the same failed seed — on
        # spam-heavy correspondence sets that deadlocks the whole search
        spent = (members | (jnp.arange(M) == seed)) & avail
        members = members & ok
        w = members.astype(jnp.float32)
        pose = umeyama(mp, sp, w)
        return used | members | spent, (pose, n, ok, members)

    used0 = jnp.zeros((M,), bool)
    _, (poses, ns, oks, membership) = jax.lax.scan(
        body, used0, None, length=max_instances
    )
    return Instances(
        poses=poses,
        votes=ns.astype(jnp.float32),
        n_corrs=ns,
        valid=oks,
        membership=membership,
    )
