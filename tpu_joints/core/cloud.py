"""Padded point-cloud container — the L1 core type of the framework.

The reference (PCL) uses dynamically sized ``pcl::PointCloud<PointXYZRGBA>``
vectors (e.g. reference ``SHOT.cpp:260``, ``crop_pcd.cpp:172``). TPUs want
static shapes, so a cloud here is a fixed-capacity ``[N, 3]`` array plus a
validity mask. Filtering never compacts on device — it only updates the mask
(reference ``removeNaNFromPointCloud`` at ``SHOT.cpp:296-299`` becomes a mask
update, per SURVEY.md A2). Invalid lanes carry a far-away sentinel position so
distance-based ops naturally ignore them even before masking.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padding/invalid points. Large enough that padded
# points never enter any radius/kNN neighborhood of real data, small enough
# that squared distances stay finite in float32 (1e6^2 * 3 = 3e12 << 3.4e38).
SENTINEL = 1.0e6


class Cloud(NamedTuple):
    """A fixed-capacity point cloud.

    Attributes:
      xyz:  float32[N, 3] point positions; invalid lanes hold ``SENTINEL``.
      mask: bool[N] validity mask.
      rgb:  float32[N, 3] colors in [0, 1], zeros when absent.
    """

    xyz: jnp.ndarray
    mask: jnp.ndarray
    rgb: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    def with_mask(self, mask: jnp.ndarray) -> "Cloud":
        """Replace the mask, re-sentineling newly invalid lanes."""
        mask = mask & self.mask
        xyz = jnp.where(mask[:, None], self.xyz, SENTINEL)
        return Cloud(xyz=xyz, mask=mask, rgb=self.rgb)


def bucket_size(n: int, minimum: int = 256) -> int:
    """Round ``n`` up to a power of two (at least ``minimum``).

    Pad-to-bucket keeps `jit` caches warm across scenes of varying size
    (SURVEY.md §7 'Recompilation discipline').
    """
    size = minimum
    while size < n:
        size *= 2
    return size


def make_cloud(
    xyz: np.ndarray,
    rgb: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
) -> Cloud:
    """Build a padded Cloud from host arrays, dropping NaN/Inf points.

    Equivalent of PCL load + ``removeNaNFromPointCloud``
    (reference ``SHOT.cpp:296-299``), done host-side at ingestion.
    """
    xyz = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)
    finite = np.isfinite(xyz).all(axis=1)
    xyz = xyz[finite]
    if rgb is not None:
        rgb = np.asarray(rgb, dtype=np.float32).reshape(-1, 3)[finite]
    n = xyz.shape[0]
    cap = capacity if capacity is not None else bucket_size(n)
    if n > cap:
        raise ValueError(f"cloud with {n} points exceeds capacity {cap}")
    pad = cap - n
    xyz_p = np.concatenate([xyz, np.full((pad, 3), SENTINEL, np.float32)], axis=0)
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    if rgb is None:
        rgb_p = np.zeros((cap, 3), np.float32)
    else:
        rgb_p = np.concatenate([rgb, np.zeros((pad, 3), np.float32)], axis=0)
    return Cloud(xyz=jnp.asarray(xyz_p), mask=jnp.asarray(mask), rgb=jnp.asarray(rgb_p))


def pad_cloud(cloud: Cloud, capacity: int) -> Cloud:
    """Grow a Cloud's capacity (host-side; shapes are static under jit)."""
    n = cloud.capacity
    if capacity < n:
        raise ValueError(f"cannot shrink cloud capacity {n} -> {capacity}")
    if capacity == n:
        return cloud
    pad = capacity - n
    xyz = jnp.concatenate([cloud.xyz, jnp.full((pad, 3), SENTINEL, jnp.float32)])
    mask = jnp.concatenate([cloud.mask, jnp.zeros(pad, bool)])
    rgb = jnp.concatenate([cloud.rgb, jnp.zeros((pad, 3), jnp.float32)])
    return Cloud(xyz=xyz, mask=mask, rgb=rgb)


def to_numpy(cloud: Cloud) -> np.ndarray:
    """Extract valid points as a compact host array."""
    mask = np.asarray(cloud.mask)
    return np.asarray(cloud.xyz)[mask]
