"""Device-mesh construction for the detection framework (SURVEY.md §2.3).

The reference has no distributed story at all — scenes are processed
serially in ``for`` loops (reference ``SHOT_scenes.cpp:204-208``) and its
only inter-process transport is ROS TCP pub/sub. Here scaling is
first-class and TPU-native:

  * ``data``  axis — scene-batch data parallelism (each chip runs the full
    pipeline on its shard of the scene batch; no communication at all).
  * ``model`` axis — descriptor-bank sharding (the bank's view axis is the
    "model weights" of this system; sharding it turns per-view matching and
    grouping into embarrassingly parallel work, with one small all-gather of
    candidate votes for the final top-k selection — XLA inserts it from the
    sharding annotations).

Collectives ride ICI: the ``data`` axis should be the outer/DCN-friendly
axis and ``model`` the inner axis when running multi-host.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over available devices.

    ``model_parallel`` must divide the device count; the remaining factor
    becomes the data axis. On a physical TPU slice, ``jax.devices()`` order
    already follows the ICI topology, so contiguous model groups share
    fast links.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"model_parallel={model_parallel} must divide {n} devices")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Scene batches: leading batch axis over ``data``, replicated over ``model``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Bank arrays: leading view axis over ``model``, replicated over ``data``."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
