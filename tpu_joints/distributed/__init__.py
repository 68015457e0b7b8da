"""Distributed execution: device meshes, sharded batches, ring collectives.

The reference's only 'cluster' is ROS TCP pub/sub between a simulator, a
detector node, and a robot controller (SURVEY.md §2.3). Its TPU-native
replacement: a ``(data, model)`` device mesh, scene-batch data parallelism,
descriptor-bank sharding, and ppermute ring exchange for clouds beyond one
chip's HBM.
"""
from tpu_joints.distributed.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    bank_sharding,
    make_mesh,
    replicated,
    scene_sharding,
)
from tpu_joints.distributed.batch import (  # noqa: F401
    detect_batch,
    shard_inputs,
    stack_clouds,
)
from tpu_joints.distributed.halo import (  # noqa: F401
    halo_radius_neighbors,
    ring_icp,
    ring_knn,
    sharded_match_votes,
)
