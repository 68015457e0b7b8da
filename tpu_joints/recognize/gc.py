"""Geometric-consistency correspondence grouping (SURVEY.md A21).

TPU-native counterpart of PCL's ``GeometricConsistencyGrouping::recognize``
(reference ``SHOT.cpp:471-483``, the ``--algorithm GC`` alternative): two
correspondences are consistent when the model-side and scene-side keypoint
distances agree within ``gc_size``; clusters of mutually consistent
correspondences of size ≥ ``gc_threshold`` become instances.

PCL grows clusters sequentially (each candidate checked against the members
added so far — an order-dependent greedy). Here the greedy is batched: seed
= the unused correspondence with the largest consistent set; the cluster is
seeded with everything consistent with the seed, then refined two rounds by
keeping members consistent with ≥ 90% of the cluster (a relaxed clique).
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

_REFINE_ROUNDS = 2
_KEEP_FRACTION = 0.9


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
        support = jnp.where(avail, support, -1)
        seed = jnp.argmax(support)
        members = consistent[seed] & avail
        for _ in range(_REFINE_ROUNDS):
            size = jnp.maximum(jnp.sum(members.astype(jnp.float32)), 1.0)
            agree = jnp.sum((consistent & members[None, :]).astype(jnp.float32), axis=1)
            members = members & (agree >= _KEEP_FRACTION * size)
        n = jnp.sum(members.astype(jnp.int32))
        ok = (n >= gc_threshold) & (support[seed] > 0)
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
