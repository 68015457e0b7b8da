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
from tpu_joints.distributed.mesh import bank_sharding, replicated, scene_sharding
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
def detect_batch(
    scenes: Cloud,
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
) -> DetectionResult:
    """Batched detection: ``vmap`` of the full pipeline over the scene axis.

    With inputs placed by :func:`shard_inputs`, GSPMD partitions the batch
    axis over ``data`` and every per-view tensor over ``model``; run it
    un-sharded and it is simply the multi-scene analog of the reference's
    serial scene loop.
    """
    return jax.vmap(lambda s: detect_fused(s, bank, cfg))(scenes)
