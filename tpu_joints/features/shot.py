"""SHOT-352 descriptor (SURVEY.md A15).

TPU-native re-design of PCL's ``SHOTEstimationOMP`` (reference
``SHOT.cpp:358-371``, ``CAD_desc.cpp:339-352``): the Signature of Histograms
of OrienTations of Tombari, Salti & Di Stefano. Per keypoint, the spherical
support is split into 32 spatial sectors (2 radial shells × 2 elevation
shells × 8 azimuth wedges, in the keypoint's local reference frame) and each
sector holds an 11-bin histogram of cos(angle) between the neighbor normal
and the LRF z-axis; contributions are linearly interpolated across all four
dimensions; the 352-vector is L2-normalized.

Two interpolation schemes, both scatter-free einsum formulations:

* ``scheme="smooth"`` (default) — TPU-native separable quadrilinear
  interpolation: the histogram of keypoint m is ONE outer-product
  contraction ``hist[r,e,a,s] = Σ_k Wr·We·Wa·Ws`` of four per-neighbor
  soft-assignment matrices. Every neighbor's mass is fully conserved
  (clamped at the radial/elevation boundaries, wrapped in azimuth), which
  measures ~5× more accepted correspondences than PCL's scheme at the
  same matching threshold on sparse/synthetic clouds — the
  production-robust choice (see docs/PARITY.md).

* ``scheme="pcl"`` — PCL-algorithm cross-implementation parity scheme:
  reproduces the algorithm of PCL's ``interpolateSingleChannel`` (the
  BASELINE.md parity north star, pinned by
  ``tests/test_golden_descriptors.py`` against fixtures from an
  independent scalar reimplementation — PCL itself is not installable
  in this environment, so no value produced by PCL has been compared
  directly). PCL's interpolation
  is *additive across dimensions* — each neighbor deposits
  ``1 − |resid_dim|`` into its home bin per dimension (summed into one
  home-slot weight) and ``|resid_dim|`` into exactly one adjacent volume
  per dimension — so the histogram is a sum of four outer-product
  contractions

      hist[a, r, e, s] = Σ_k  Ah·Rh·Eh·S1  +  Aadj·Rh·Eh·Sh
                            +  Ah·Radj·Eh·Sh  +  Ah·Rh·Eadj·Sh

  over one-hot home assignments and per-dimension adjacent weights —
  four einsums, not a scatter — reproducing PCL's numeric scheme exactly
  (including its documented edge behaviors: boundary mass loss at the
  support center/rim/poles, the ±0.5 azimuth clamp, and the
  shape-adjacent ``% 10`` wrap — see ``shot_histograms_pcl``).

Either way PCL's per-point branchy accumulation (OpenMP-threaded in the
reference) becomes pure batched matmul/VPU work with no gather/scatter
beyond the initial neighbor lookup. Bank and scene must use the SAME
scheme (they are compared in descriptor space).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_joints.core.cloud import Cloud
from tpu_joints.features.lrf import shot_lrf
from tpu_joints.neighbors import radius_neighbors

_HI = jax.lax.Precision.HIGHEST

N_AZIMUTH = 8
N_ELEVATION = 2
N_RADIAL = 2
N_SHAPE_BINS = 10       # PCL nr_shape_bins_
N_SLOTS = N_SHAPE_BINS + 1  # 11 histogram slots per volume
SHOT_DIM = N_RADIAL * N_ELEVATION * N_AZIMUTH * N_SLOTS  # 352


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


def shot_histograms_smooth(
    key_xyz: jnp.ndarray,
    rf: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_normals: jnp.ndarray,
    nbr_valid: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Raw (unnormalized) [M, 352] SHOT histograms, smooth scheme.

    Separable quadrilinear interpolation: one einsum over four
    per-neighbor soft-assignment matrices (module docstring). Mass is
    conserved everywhere — the measurably more correspondence-robust
    default (docs/PARITY.md).

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
    s_coord = (1.0 + cos) * N_SHAPE_BINS / 2.0  # [0, 10]

    az = jnp.arctan2(local[..., 1], local[..., 0])  # (-pi, pi]
    a_coord = (az + jnp.pi) / (2.0 * jnp.pi) * N_AZIMUTH  # [0, 8)

    safe_d = jnp.maximum(d, 1e-12)
    incl_cos = jnp.clip(local[..., 2] / safe_d, -1.0, 1.0)
    incl = jnp.arccos(incl_cos)  # [0, pi], 0 = +z pole
    e_coord = incl / (jnp.pi / 2.0)  # [0, 2]

    r_coord = d / jnp.float32(radius) * N_RADIAL  # [0, 2]

    w = valid.astype(jnp.float32)
    Ws = _interp_integer(s_coord, N_SLOTS) * w[..., None]
    Wa = _interp_wrapped(a_coord, N_AZIMUTH)
    We = _interp_clamped(e_coord, N_ELEVATION)
    Wr = _interp_clamped(r_coord, N_RADIAL)

    hist = jnp.einsum("mkr,mke,mka,mks->mreas", Wr, We, Wa, Ws, precision=_HI)
    return hist.reshape(key_xyz.shape[0], SHOT_DIM)


def shot_histograms_pcl(
    key_xyz: jnp.ndarray,
    rf: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_normals: jnp.ndarray,
    nbr_valid: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Raw (unnormalized) [M, 352] SHOT histograms, PCL-algorithm parity.

    Implements PCL's ``interpolateSingleChannel`` scheme exactly (additive
    quadrilinear interpolation): each neighbor's home volume/slot receives
    ``(1 − |shape resid|) + Σ_dim (1 ± dim resid)`` and one adjacent
    volume per spatial dimension (and one adjacent slot on the shape axis)
    receives that dimension's residual. Deliberately-preserved PCL edge
    behaviors (cross-implementation parity, BASELINE.md north star —
    fixtures come from an independent scalar reimplementation, PCL itself
    being unavailable in this environment):

      * mass decays toward the support center/rim and the ±z poles (those
        boundary residuals have no adjacent volume, and PCL still reduces
        the home weight);
      * the azimuth residual is clamped to ±0.5 of a sector;
      * the shape-adjacent slot wraps ``% 10`` — cos values binning into
        (9, 9.5) leak their residual into slot 0 (PCL's documented wrap
        quirk; slot 10 only ever receives home mass);
      * neighbors exactly on the LRF z-axis skip azimuth interpolation.

    Flattened layout matches PCL: volume = azimuth·4 + radial·2 +
    elevation, 11 slots per volume (azimuth sector 0 covers atan2 angles
    [−π, −3π/4), i.e. PCL's bit-logic numbering).

    Args:
      key_xyz: [M, 3] keypoints; rf: [M, 3, 3] LRFs (rows x/y/z).
      nbr_xyz / nbr_normals / nbr_valid: [M, K, ·] padded support gathers.
    """
    r = jnp.float32(radius)
    rel = nbr_xyz - key_xyz[:, None, :]  # [M, K, 3]
    local = jnp.einsum("mij,mkj->mki", rf, rel, precision=_HI)  # [M, K, 3]
    d = jnp.linalg.norm(rel, axis=-1)
    valid = nbr_valid & (d > 1e-9) & (d <= radius)
    x, y, z = local[..., 0], local[..., 1], local[..., 2]

    # --- shape (cosine) axis: home slot + %10-wrapped adjacent slot ------
    cos = jnp.einsum("mkj,mj->mk", nbr_normals, rf[:, 2, :])
    cos = jnp.clip(cos, -1.0, 1.0)
    bin_dist = (1.0 + cos) * N_SHAPE_BINS / 2.0          # [0, 10]
    step = jnp.floor(bin_dist + 0.5)                     # home slot, [0, 10]
    resid = bin_dist - step                              # (-0.5, 0.5]
    adj_slot = jnp.where(resid > 0,
                         (step + 1) % N_SHAPE_BINS,
                         (step - 1 + N_SHAPE_BINS) % N_SHAPE_BINS)

    # --- home spatial volume bits ---------------------------------------
    az = jnp.arctan2(y, x)                               # (-pi, pi]
    sel = jnp.clip(jnp.floor((az + jnp.pi) / (jnp.pi / 4.0)), 0, N_AZIMUTH - 1)
    rbit = d > 0.5 * r                                   # outer husk
    ebit = z > 0.0                                       # upper elevation

    # --- per-dimension residuals (PCL's husk/pole/sector boundaries) -----
    rd_out = (d - 0.75 * r) / (0.5 * r)                  # (-0.5, 0.5]
    rd_in = (d - 0.25 * r) / (0.5 * r)
    home_r = jnp.where(rbit,
                       jnp.where(d > 0.75 * r, 1.0 - rd_out, 1.0 + rd_out),
                       jnp.where(d < 0.25 * r, 1.0 + rd_in, 1.0 - rd_in))
    adj_r = jnp.where(rbit,
                      jnp.where(d > 0.75 * r, 0.0, -rd_out),
                      jnp.where(d < 0.25 * r, 0.0, rd_in))

    incl = jnp.arccos(jnp.clip(z / jnp.maximum(d, 1e-12), -1.0, 1.0))
    half_pi = jnp.float32(jnp.pi / 2.0)
    id_lo = (incl - 3.0 * jnp.pi / 4.0) / half_pi
    id_hi = (incl - jnp.pi / 4.0) / half_pi
    home_e = jnp.where(incl > half_pi,
                       jnp.where(incl > 3.0 * jnp.pi / 4.0,
                                 1.0 - id_lo, 1.0 + id_lo),
                       jnp.where(incl < jnp.pi / 4.0,
                                 1.0 + id_hi, 1.0 - id_hi))
    adj_e = jnp.where(incl > half_pi,
                      jnp.where(incl > 3.0 * jnp.pi / 4.0, 0.0, -id_lo),
                      jnp.where(incl < jnp.pi / 4.0, 0.0, id_hi))

    center = -7.0 * jnp.pi / 8.0 + sel * (jnp.pi / 4.0)
    azd = jnp.clip((az - center) / (jnp.pi / 4.0), -0.5, 0.5)
    on_axis = (x == 0.0) & (y == 0.0)                    # PCL: no az interp
    home_a = jnp.where(on_axis, 0.0, 1.0 - jnp.abs(azd))
    adj_a = jnp.where(on_axis, 0.0, jnp.abs(azd))
    adj_sel = jnp.where(azd > 0,
                        (sel + 1) % N_AZIMUTH,
                        (sel - 1 + N_AZIMUTH) % N_AZIMUTH)

    int_weight = (1.0 - jnp.abs(resid)) + home_r + home_e + home_a

    # --- four-einsum assembly --------------------------------------------
    w = valid.astype(jnp.float32)
    oh = lambda b, n: jax.nn.one_hot(b.astype(jnp.int32), n, dtype=jnp.float32)
    Sh = oh(step, N_SLOTS)
    S1 = (Sh * int_weight[..., None] + oh(adj_slot, N_SLOTS)
          * jnp.abs(resid)[..., None]) * w[..., None]
    Shw = Sh * w[..., None]
    Ah = oh(sel, N_AZIMUTH)
    Rh = oh(rbit, N_RADIAL)
    Eh = oh(ebit, N_ELEVATION)
    Aadj = oh(adj_sel, N_AZIMUTH) * adj_a[..., None]
    Radj = oh(~rbit, N_RADIAL) * adj_r[..., None]
    Eadj = oh(~ebit, N_ELEVATION) * adj_e[..., None]

    ein = functools.partial(
        jnp.einsum, "mka,mkr,mke,mks->mares", precision=_HI)
    hist = (ein(Ah, Rh, Eh, S1) + ein(Aadj, Rh, Eh, Shw)
            + ein(Ah, Radj, Eh, Shw) + ein(Ah, Rh, Eadj, Shw))
    return hist.reshape(key_xyz.shape[0], SHOT_DIM)


def shot_histograms(
    key_xyz: jnp.ndarray,
    rf: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_normals: jnp.ndarray,
    nbr_valid: jnp.ndarray,
    radius: float,
    scheme: str = "smooth",
) -> jnp.ndarray:
    """Raw [M, 352] SHOT histograms; ``scheme`` ∈ {"smooth", "pcl"}."""
    fn = {"smooth": shot_histograms_smooth, "pcl": shot_histograms_pcl}
    if scheme not in fn:
        raise ValueError(f"unknown SHOT scheme {scheme!r}")
    return fn[scheme](key_xyz, rf, nbr_xyz, nbr_normals, nbr_valid, radius)


@functools.partial(jax.jit, static_argnames=("radius", "k_max", "scheme"))
def compute_shot(
    keypoints: Cloud,
    surface: Cloud,
    surface_normals: jnp.ndarray,
    radius: float,
    k_max: int = 128,
    scheme: str = "smooth",
    neighbors: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full SHOT pipeline for a keypoint set over a search surface.

    Mirrors PCL usage: ``setInputCloud(keypoints); setSearchSurface(cloud);
    setInputNormals(cloud_normals); setRadiusSearch(r)`` (reference
    ``SHOT.cpp:358-371``). One radius gather feeds both the LRF and the
    histogram. ``scheme`` selects the interpolation (module docstring);
    bank and scene descriptors must be built with the same scheme.

    ``neighbors`` optionally carries a precomputed ``(idx, within)`` support
    gather at the SAME radius/k_max (``radius_neighbors`` contract): when
    the pipeline's voting frames use the descriptor's radius, one gather
    feeds both stages (a second k=256 gather was the single most expensive
    op in the serving prepare stage — docs/PERFORMANCE.md).

    Returns:
      (descriptors float32[M, 352] L2-normalized, rf float32[M, 3, 3],
       valid bool[M]).
    """
    if neighbors is None:
        idx, within, _ = radius_neighbors(
            keypoints.xyz, surface.xyz, radius, k_max,
            source_mask=surface.mask)
    else:
        idx, within = neighbors
    nbr_valid = within & keypoints.mask[:, None]
    nbr_xyz = surface.xyz[idx]
    nbr_normals = surface_normals[idx]

    rf, rf_ok = shot_lrf(keypoints.xyz, nbr_xyz, nbr_valid, radius)
    hist = shot_histograms(keypoints.xyz, rf, nbr_xyz, nbr_normals, nbr_valid,
                           radius, scheme=scheme)
    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    desc = hist / jnp.maximum(norm, 1e-12)
    valid = keypoints.mask & rf_ok & (norm[:, 0] > 1e-12)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return desc, rf, valid
