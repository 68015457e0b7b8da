"""Scene-batch data parallelism + bank sharding (SURVEY.md §2.3 DP/TP).

The reference processes scenes one at a time in host loops
(``SHOT_scenes.cpp:204-208``: ``for m … cloud_cb()``) and reloads model
views from disk inside the loop (``SHOT.cpp:239-265``). The TPU-native
formulation: stack scenes into one padded batch, ``vmap`` the whole
pipeline over the batch axis, and let GSPMD shard

  * the scene batch over the mesh ``data`` axis (pure replication of
    compute, zero communication), and
  * the bank's view axis over the mesh ``model`` axis (matching + Hough
    grouping are per-view independent; only the final candidate top-k
    crosses shards, which XLA lowers to one small all-gather of vote
    scalars over ICI).

Compute follows data: placing the inputs with these shardings is all the
annotation `jit` needs — no pmap, no hand-written collectives here (the
explicit-collective formulation lives in ``halo.py`` for clouds larger
than one chip's HBM).
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import Cloud
from tpu_joints.distributed.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    bank_sharding,
    replicated,
    scene_sharding,
)
from tpu_joints.modelbank.bank import ModelBank
from tpu_joints.pipelines.detect import DetectionResult, detect_fused


def stack_clouds(clouds: List[Cloud]) -> Cloud:
    """Stack equally-padded clouds into a batched Cloud [B, N, …]."""
    return Cloud(
        xyz=jnp.stack([c.xyz for c in clouds]),
        mask=jnp.stack([c.mask for c in clouds]),
        rgb=jnp.stack([c.rgb for c in clouds]),
    )


def shard_inputs(scenes: Cloud, bank: ModelBank, mesh) -> tuple:
    """Place a scene batch and a bank onto the mesh with DP/TP shardings.

    Scene arrays get a leading-axis ``data`` sharding; bank arrays get a
    leading-(view)-axis ``model`` sharding except the tiny ``poses`` table,
    which is replicated (it is gathered by winning view index at the end).
    """
    scenes = jax.device_put(scenes, scene_sharding(mesh))
    b = bank_sharding(mesh)
    r = replicated(mesh)
    bank = ModelBank(
        view_xyz=jax.device_put(bank.view_xyz, b),
        view_mask=jax.device_put(bank.view_mask, b),
        key_xyz=jax.device_put(bank.key_xyz, b),
        key_valid=jax.device_put(bank.key_valid, b),
        desc=jax.device_put(bank.desc, b),
        rf=jax.device_put(bank.rf, b),
        poses=jax.device_put(bank.poses, r),
        icp_xyz=jax.device_put(bank.icp_xyz, b),
        icp_mask=jax.device_put(bank.icp_mask, b),
        model_xyz=jax.device_put(bank.model_xyz, r),
        model_mask=jax.device_put(bank.model_mask, r),
        params_hash=bank.params_hash,
    )
    return scenes, bank


@functools.partial(jax.jit, static_argnames=("cfg",))
def _detect_batch_gspmd(
    scenes: Cloud,
    bank: ModelBank,
    cfg: DetectionConfig,
) -> DetectionResult:
    return jax.vmap(lambda s: detect_fused(s, bank, cfg))(scenes)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _detect_batch_shardmap(
    scenes: Cloud,
    bank: ModelBank,
    cfg: DetectionConfig,
    mesh,
) -> DetectionResult:
    """Explicit-collective TP formulation: matching + grouping run inside
    a ``shard_map`` over the ``model`` axis, so each device extracts Hough
    peaks from ITS OWN view shard and only the small per-view instance
    tables ([V, P] poses/votes/membership) cross ICI.

    Under plain GSPMD (:func:`_detect_batch_gspmd`) XLA resolves the
    ``model`` sharding BEFORE peak extraction — an all-gather of the
    ``f32[V, 64³]`` Hough accumulators, ~60 MiB/scene, ~98% of the
    pipeline's collective payload (docs/PARITY.md §'Measured TP
    communication shape'). Moving the boundary after peak extraction
    shrinks the model-axis traffic to the instance tables (a few KiB).
    """
    from jax.sharding import PartitionSpec as P

    from tpu_joints.pipelines.detect import (
        _group_views_arrays,
        match_bank,
        prepare_scene,
        refine_instances,
    )

    # feature extraction: batch-sharded over `data`, replicated over
    # `model` (per-scene compute; each model column duplicates it, which
    # is what GSPMD would emit for a model-replicated consumer anyway)
    feats = jax.vmap(lambda s: prepare_scene(s, cfg))(scenes)

    def match_group(desc_v, key_xyz_v, key_valid_v, rf_v, f):
        # one device: local scene block × LOCAL view shard
        def one(fb):
            corrs = match_bank(fb.desc, fb.desc_valid, desc_v,
                               key_valid_v, cfg)
            inst = _group_views_arrays(fb, key_xyz_v, rf_v, key_valid_v,
                                       corrs, cfg)
            n_local = jnp.sum(corrs.valid.astype(jnp.int32))
            return inst, jax.lax.psum(n_local, MODEL_AXIS)
        return jax.vmap(one)(f)

    inst, n_corr = jax.shard_map(
        match_group,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS),
                  P(MODEL_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, MODEL_AXIS), P(DATA_AXIS)),
    )(bank.desc, bank.key_xyz, bank.key_valid, bank.rf, feats)

    # candidate selection onward consumes only the [V, P] instance tables;
    # the per-candidate bank gathers (icp_xyz/view_xyz by winning view)
    # are the small all-gathers GSPMD was always going to insert
    def rest(f, ins, nc):
        return refine_instances(f, bank, ins, nc, cfg)

    return jax.vmap(rest)(feats, inst, n_corr)


def detect_batch(
    scenes: Cloud,
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
    mesh=None,
) -> DetectionResult:
    """Batched detection: ``vmap`` of the full pipeline over the scene axis.

    With inputs placed by :func:`shard_inputs`, GSPMD partitions the batch
    axis over ``data`` and every per-view tensor over ``model``; run it
    un-sharded and it is simply the multi-scene analog of the reference's
    serial scene loop.

    Pass the ``mesh`` to use the explicit ``shard_map`` TP formulation
    (:func:`_detect_batch_shardmap`): identical results, but the grouping
    stage's accumulators never cross ICI.
    """
    if mesh is None:
        return _detect_batch_gspmd(scenes, bank, cfg)
    return _detect_batch_shardmap(scenes, bank, cfg, mesh)
