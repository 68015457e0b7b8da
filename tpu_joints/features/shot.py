"""SHOT-352 descriptor (SURVEY.md A15).

TPU-native re-design of PCL's ``SHOTEstimationOMP`` (reference
``SHOT.cpp:358-371``, ``CAD_desc.cpp:339-352``): the Signature of Histograms
of OrienTations of Tombari, Salti & Di Stefano. Per keypoint, the spherical
support is split into 32 spatial sectors (2 radial shells × 2 elevation
shells × 8 azimuth wedges, in the keypoint's local reference frame) and each
sector holds an 11-bin histogram of cos(angle) between the neighbor normal
and the LRF z-axis; contributions are linearly interpolated across all four
dimensions; the 352-vector is L2-normalized.

Key TPU insight: the quadrilinear interpolation is *separable*, so the
histogram of keypoint m is an outer-product contraction

    hist[r, e, a, s] = Σ_k  Wr[k,r] · We[k,e] · Wa[k,a] · Ws[k,s]

of four per-neighbor soft-assignment matrices — an einsum, not a scatter.
This turns PCL's per-point branchy accumulation (OpenMP-threaded in the
reference) into pure batched matmul/VPU work with no gather/scatter beyond
the initial neighbor lookup.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.features.lrf import shot_lrf
from tpu_joints.neighbors import radius_neighbors

_HI = jax.lax.Precision.HIGHEST

N_AZIMUTH = 8
N_ELEVATION = 2
N_RADIAL = 2
N_SHAPE = 11  # 10 shape bins + terminal slot, PCL's (nr_shape_bins + 1)
SHOT_DIM = N_RADIAL * N_ELEVATION * N_AZIMUTH * N_SHAPE  # 352


def _interp_clamped(coord: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """[..., n_bins] linear interpolation weights for bin centers at
    b + 0.5, coordinate clamped to [0.5, n_bins - 0.5] (boundary mass stays
    in the terminal bins)."""
    c = jnp.clip(coord, 0.5, n_bins - 0.5)
    centers = jnp.arange(n_bins, dtype=coord.dtype) + 0.5
    return jnp.maximum(1.0 - jnp.abs(c[..., None] - centers), 0.0)


def _interp_wrapped(coord: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Same, but periodic (azimuth wedges wrap around)."""
    centers = jnp.arange(n_bins, dtype=coord.dtype) + 0.5
    delta = jnp.abs(coord[..., None] - centers)
    delta = jnp.minimum(delta, n_bins - delta)
    return jnp.maximum(1.0 - delta, 0.0)


def _interp_integer(coord: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Weights for integer-centered bins 0..n_bins-1 (the cosine/shape dim:
    coordinate already spans [0, n_bins - 1])."""
    centers = jnp.arange(n_bins, dtype=coord.dtype)
    return jnp.maximum(1.0 - jnp.abs(coord[..., None] - centers), 0.0)


def shot_histograms(
    key_xyz: jnp.ndarray,
    rf: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_normals: jnp.ndarray,
    nbr_valid: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Raw (unnormalized) [M, 352] SHOT histograms.

    Args:
      key_xyz: [M, 3] keypoints; rf: [M, 3, 3] LRFs (rows x/y/z).
      nbr_xyz / nbr_normals / nbr_valid: [M, K, ·] padded support gathers.
    """
    rel = nbr_xyz - key_xyz[:, None, :]  # [M, K, 3]
    local = jnp.einsum("mij,mkj->mki", rf, rel, precision=_HI)  # [M, K, 3]
    d = jnp.linalg.norm(rel, axis=-1)
    valid = nbr_valid & (d > 1e-9) & (d <= radius)

    # cosine between neighbor normal and LRF z-axis → shape coordinate
    cos = jnp.einsum("mkj,mj->mk", nbr_normals, rf[:, 2, :])
    cos = jnp.clip(cos, -1.0, 1.0)
    s_coord = (1.0 + cos) * (N_SHAPE - 1) / 2.0  # [0, 10]

    az = jnp.arctan2(local[..., 1], local[..., 0])  # (-pi, pi]
    a_coord = (az + jnp.pi) / (2.0 * jnp.pi) * N_AZIMUTH  # [0, 8)

    safe_d = jnp.maximum(d, 1e-12)
    incl_cos = jnp.clip(local[..., 2] / safe_d, -1.0, 1.0)
    incl = jnp.arccos(incl_cos)  # [0, pi], 0 = +z pole
    e_coord = incl / (jnp.pi / 2.0)  # [0, 2]

    r_coord = d / jnp.float32(radius) * N_RADIAL  # [0, 2]

    w = valid.astype(jnp.float32)
    Ws = _interp_integer(s_coord, N_SHAPE) * w[..., None]
    Wa = _interp_wrapped(a_coord, N_AZIMUTH)
    We = _interp_clamped(e_coord, N_ELEVATION)
    Wr = _interp_clamped(r_coord, N_RADIAL)

    hist = jnp.einsum("mkr,mke,mka,mks->mreas", Wr, We, Wa, Ws, precision=_HI)
    return hist.reshape(key_xyz.shape[0], SHOT_DIM)


@functools.partial(jax.jit, static_argnames=("radius", "k_max"))
def compute_shot(
    keypoints: Cloud,
    surface: Cloud,
    surface_normals: jnp.ndarray,
    radius: float,
    k_max: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full SHOT pipeline for a keypoint set over a search surface.

    Mirrors PCL usage: ``setInputCloud(keypoints); setSearchSurface(cloud);
    setInputNormals(cloud_normals); setRadiusSearch(r)`` (reference
    ``SHOT.cpp:358-371``). One radius gather feeds both the LRF and the
    histogram.

    Returns:
      (descriptors float32[M, 352] L2-normalized, rf float32[M, 3, 3],
       valid bool[M]).
    """
    idx, within, _ = radius_neighbors(
        keypoints.xyz, surface.xyz, radius, k_max, source_mask=surface.mask
    )
    nbr_valid = within & keypoints.mask[:, None]
    nbr_xyz = surface.xyz[idx]
    nbr_normals = surface_normals[idx]

    rf, rf_ok = shot_lrf(keypoints.xyz, nbr_xyz, nbr_valid, radius)
    hist = shot_histograms(keypoints.xyz, rf, nbr_xyz, nbr_normals, nbr_valid, radius)
    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    desc = hist / jnp.maximum(norm, 1e-12)
    valid = keypoints.mask & rf_ok & (norm[:, 0] > 1e-12)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return desc, rf, valid
